"""End-to-end tests for the two sync pipelines (SURVEY.md §3.2/§3.3) and the
CLI over the ACI fixtures: mirror convergence/idempotence, mail-document
semantics, REST sink chunking/retry/retain, and the reference's per-run
stats."""

from __future__ import annotations

import hashlib
import io
import json
import sys

import pytest
from pyspark.sql import functions as F

from tests.aci_fixtures import build_fixtures, TODAY

TODAY_S = TODAY.isoformat()


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aci_sync_fixtures"))
    build_fixtures(out)
    return out


@pytest.fixture(scope="module")
def aci(spark, fixture_dir):
    from aci_export_spark.queries.catalog import load_catalog

    return load_catalog(spark, fixture_dir)


class TestAppSync:
    def test_first_run_then_idempotent(self, spark, aci, tmp_path):
        from aci_export_spark.sync.app_sync import (
            LOAD_ORDER, load_targets, run_mirror_sync, write_post_states,
        )

        mirror = str(tmp_path / "mirror")
        import os

        os.makedirs(mirror)
        # first run: empty mirror → all upserts, no deletes
        post, stats = run_mirror_sync(aci, load_targets(spark, mirror), today=TODAY_S)
        assert set(stats) == set(LOAD_ORDER)
        for name in LOAD_ORDER:
            assert stats[name]["deleted"] == 0
            assert stats[name]["upserted"] == post[name].count() > 0
        write_post_states(post, mirror)

        # second run over the already-synced mirror: converged — the
        # post-state equals the mirror, and nothing is deleted
        targets2 = load_targets(spark, mirror)
        post2, stats2 = run_mirror_sync(aci, targets2, today=TODAY_S)
        for name in LOAD_ORDER:
            assert stats2[name]["deleted"] == 0, name
            assert post2[name].count() == targets2[name].count(), name

    def test_mirror_gc_deletes_vanished_rows(self, spark, aci, tmp_path):
        from aci_export_spark.operators.mirror import mirror_stats, mirror_sync

        src = aci["clubs"].select("uid", "name")
        # stale mirror: an extra row that no longer exists in the source
        stale = src.unionByName(
            spark.createDataFrame([(99999, "Ghost Club")], ["uid", "name"])
        )
        post = mirror_sync(stale, src, ["uid"])
        st = mirror_stats(stale, src, ["uid"])
        assert st.deleted == 1
        assert post.filter(F.col("uid") == 99999).count() == 0

    def test_user_consolidation_includes_partners_and_leaders(self, aci):
        from aci_export_spark.sync.app_sync import extract_users

        users = extract_users(aci, today=TODAY_S)
        # synthetic id present and email-derived (db/src/user.rs:31-35)
        row = users.filter(F.col("email").isNotNull()).first()
        digest = hashlib.sha256(row["email"].strip().lower().encode()).digest()
        import base64

        assert row["id"] == base64.urlsafe_b64encode(digest).rstrip(b"=").decode()
        # uids unique
        assert users.count() == users.select("uid").distinct().count()


class TestMailSync:
    def test_documents_partner_fanout_and_merge_fields(self, aci):
        from aci_export_spark.sync.mail_sync import documents_for_scope

        docs = documents_for_scope(aci, today=TODAY_S)
        rows = {(r["email_address"], r["is_partner"]): r for r in docs.collect()}
        # every document id is md5(lower(email)) (F8)
        for (email, _), r in rows.items():
            assert r["id"] == hashlib.md5(email.encode()).hexdigest()
        partners = [r for r in rows.values() if r["is_partner"]]
        assert partners, "fixtures include partnered members"
        for p in partners:
            # partner doc points back at its primary (members.rs:887-895)
            assert p["primary_ref"] is not None
            assert (p["primary_ref"], False) in rows
        # no placeholder domains survive the validity filter (P9)
        assert not [e for (e, _) in rows if e.endswith(("noemail.com", "example.com"))]
        # typed rendering: JOINED %Y-%m-%d, BDAY %m/%d (F11)
        with_bday = [r for r in rows.values() if r["merge_fields"].get("BDAY")]
        assert with_bday
        for r in with_bday[:5]:
            mf = r["merge_fields"]
            assert len(mf["BDAY"].split("/")) == 2
            if mf.get("JOINED"):
                assert len(mf["JOINED"].split("-")) == 3
        # the >10-char tag was rejected from the schema (merge_fields.rs:119-127)
        assert all("WAYTOOLONGTAG" not in r["merge_fields"] for r in rows.values())

    def test_rest_job_upsert_retain_tags_with_retries(self, aci, tmp_path):
        from aci_export_spark.sync.mail_sync import documents_for_scope, run_job
        from aci_export_spark.sync.rest import JournalingMailchimpClient

        base = str(tmp_path / "journal")
        stats = run_job(
            aci,
            client_factory=lambda: JournalingMailchimpClient(
                base, fail_first_n_attempts=1  # every batch fails once → retry covers it
            ),
            today=TODAY_S,
        )
        client = JournalingMailchimpClient(base)
        upserted = client.upserted_rows()
        # exactly the documents, each exactly once despite injected failures…
        docs = documents_for_scope(aci, today=TODAY_S)
        assert stats["upserted"] == docs.count()
        assert len(upserted) == docs.count()
        # journaled ids are exactly the document ids (as a multiset — a
        # partner email may legitimately collide with another member's email,
        # and the reference upserts both docs to the same remote member)
        assert sorted(r["id"] for r in upserted) == sorted(
            r["id"] for r in docs.select("id").collect()
        )
        # …retain deleted the stale remote-only subscriber but kept 'cleaned'
        gone1 = hashlib.md5(b"gone1@x.test").hexdigest()
        gone2 = hashlib.md5(b"gone2@x.test").hexdigest()
        deleted = client.deleted_ids()
        assert gone1 in deleted and gone2 not in deleted
        assert stats["deleted"] == len(deleted)
        # …tags: 4 per document, statuses are active/inactive strings
        tags = client.tag_updates()
        assert len(tags) == 4 * docs.count()
        assert {t["status"] for t in tags} <= {"active", "inactive"}
        assert stats["tag_updates"] == len(tags)

    def test_batch_item_errors_logged_and_counted(self, aci, tmp_path):
        from aci_export_spark.sync.mail_sync import documents_for_scope, run_job
        from aci_export_spark.sync.rest import JournalingMailchimpClient

        docs = documents_for_scope(aci, today=TODAY_S)
        victim = docs.select("email_address").first()["email_address"]
        base = str(tmp_path / "journal")
        stats = run_job(
            aci,
            client_factory=lambda: JournalingMailchimpClient(
                base, item_error_emails={victim}
            ),
            today=TODAY_S,
        )
        n_victim = docs.filter(F.col("email_address") == victim).count()
        assert stats["upsert_errors"] == n_victim
        assert stats["upserted"] == docs.count() - n_victim
        # the rejected item did not land in the journal
        landed = JournalingMailchimpClient(base).upserted_rows()
        assert all(r["email_address"] != victim for r in landed)
        assert len(landed) == stats["upserted"]

    def test_job_preflight_fails_fast_with_no_writes(self, aci, tmp_path):
        from aci_export_spark.sync.mail_sync import run_job
        from aci_export_spark.sync.rest import (
            JournalingMailchimpClient,
            PermanentError,
        )

        base = str(tmp_path / "journal")

        class DeadApiClient(JournalingMailchimpClient):
            def ping(self):
                raise PermanentError(401, "bad api key")

        with pytest.raises(PermanentError):
            run_job(aci, client_factory=lambda: DeadApiClient(base), today=TODAY_S)
        # the pre-flight gate held: nothing was upserted, deleted, or tagged
        client = JournalingMailchimpClient(base)
        assert client.upserted_rows() == []
        assert client.deleted_ids() == set()
        assert client.tag_updates() == []

    def test_job_fault_isolation(self, aci, tmp_path):
        from aci_export_spark.sync.mail_sync import run_jobs

        def factory_for(job):
            if job.get("boom"):
                def bad():
                    raise RuntimeError("injected job failure")
                return bad
            from aci_export_spark.sync.rest import JournalingMailchimpClient

            return lambda: JournalingMailchimpClient(str(tmp_path / f"j{job['id']}"))

        results = run_jobs(
            aci,
            jobs=[{"id": 1, "club": 5}, {"id": 2, "boom": True}, {"id": 3}],
            client_factory_for=factory_for,
            today=TODAY_S,
        )
        assert "error" in results["2"]
        assert results["1"]["upserted"] > 0
        assert results["3"]["upserted"] > results["1"]["upserted"]


class TestCli:
    def _run(self, argv):
        from aci_export_spark import cli

        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            cli.main(argv)
        finally:
            sys.stdout = old
        return buf.getvalue()

    def test_ddb_members_json(self, fixture_dir):
        out = self._run(
            ["--data-dir", fixture_dir, "--today", TODAY_S, "ddb", "members", "--club", "5"]
        )
        rows = json.loads(out)
        assert rows and all("email" in r for r in rows)
        # S7 null-skipping: absent optional fields are omitted, not null
        assert all(v is not None for r in rows for v in r.values())

    def test_ddb_leadership_current(self, fixture_dir):
        out = self._run(
            ["--data-dir", fixture_dir, "ddb", "leadership",
             "--type", "club", "--date-filter", "current"]
        )
        assert isinstance(json.loads(out), list)

    def test_sync_app_run_cli(self, fixture_dir, tmp_path):
        mirror = str(tmp_path / "m")
        import os

        os.makedirs(mirror)
        out = self._run(
            ["--data-dir", fixture_dir, "--today", TODAY_S,
             "sync-app", "run", "--mirror-dir", mirror]
        )
        stats = json.loads(out)
        assert stats["users"]["upserted"] > 0
        assert os.path.exists(os.path.join(mirror, "users.parquet"))

    def test_sync_mail_run_cli(self, fixture_dir, tmp_path):
        journal = str(tmp_path / "journal")
        out = self._run(
            ["--data-dir", fixture_dir, "--today", TODAY_S,
             "sync-mail", "run", "--journal-dir", journal]
        )
        stats = json.loads(out)
        assert stats["upserted"] > 0 and stats["tag_updates"] == 4 * stats["upserted"]

    def test_sync_mail_delete_requires_confirm(self, fixture_dir, tmp_path):
        from aci_export_spark.sync.rest import JournalingMailchimpClient

        journal = str(tmp_path / "journal")
        with pytest.raises(SystemExit, match="--confirm"):
            self._run(["--data-dir", fixture_dir,
                       "sync-mail", "delete", "--journal-dir", journal])
        # guard rail held: nothing was deleted
        assert JournalingMailchimpClient(journal).deleted_ids() == set()

        out = self._run(["--data-dir", fixture_dir,
                         "sync-mail", "delete", "--journal-dir", journal,
                         "--confirm"])
        stats = json.loads(out)
        assert stats["deleted"] > 0
        deleted = JournalingMailchimpClient(journal).deleted_ids()
        assert len(deleted) == stats["deleted"]

    def test_sync_mail_fields_gates_deletes(self, fixture_dir, tmp_path):
        from aci_export_spark.sync.rest import JournalingMailchimpClient

        j1 = str(tmp_path / "j1")
        out = self._run(["--data-dir", fixture_dir,
                         "sync-mail", "fields", "--journal-dir", j1])
        stats = json.loads(out)
        # fixture diff: BDAY/JOINED/CLUBNUM create, LNAME update, OBSOLETE
        # delete — the delete is SKIPPED without the flag, and the >10-char
        # WAYTOOLONGTAG def is rejected BEFORE the diff (merge_fields.rs:
        # 119-127: the data path never populates it, so creating it remotely
        # would 400 against the real API)
        assert stats == {"created": 3, "updated": 1, "deleted": 0,
                         "deletes_skipped": 1, "defs_rejected": 1}
        ops = JournalingMailchimpClient(j1).merge_field_ops()
        assert sorted({o["op"] for o in ops}) == ["create", "update"]
        assert all(o["tag"] != "WAYTOOLONGTAG" for o in ops)

        j2 = str(tmp_path / "j2")
        out = self._run(["--data-dir", fixture_dir,
                         "sync-mail", "fields", "--journal-dir", j2,
                         "--process-deletes"])
        stats = json.loads(out)
        assert stats["deleted"] == 1 and stats["deletes_skipped"] == 0
        ops = JournalingMailchimpClient(j2).merge_field_ops()
        assert {o["tag"] for o in ops if o["op"] == "delete"} == {"OBSOLETE"}


class TestConfigAndBatchProtocol:
    def test_toml_merge_field_defs_roundtrip(self, tmp_path):
        from aci_export_spark.sync.mail import MAX_TAG_LEN, load_merge_field_defs_toml

        p = tmp_path / "fields.toml"
        p.write_text(
            '[[fields]]\ntag = "FNAME"\nname = "First Name"\ntype = "text"\n'
            '[[fields]]\ntag = "BDAY"\nname = "Birthday"\ntype = "birthday"\n'
            '[[fields]]\ntag = "WAYTOOLONGTAG"\nname = "Bad"\ntype = "text"\n'
        )
        defs = load_merge_field_defs_toml(str(p))
        assert [d["tag"] for d in defs] == ["FNAME", "BDAY", "WAYTOOLONGTAG"]
        valid = [d for d in defs if len(d["tag"]) <= MAX_TAG_LEN]
        assert [d["tag"] for d in valid] == ["FNAME", "BDAY"]

    def test_toml_missing_key_rejected(self, tmp_path):
        from aci_export_spark.sync.mail import load_merge_field_defs_toml

        p = tmp_path / "bad.toml"
        p.write_text('[[fields]]\ntag = "X"\nname = "No type"\n')
        with pytest.raises(ValueError, match="missing keys"):
            load_merge_field_defs_toml(str(p))

    def test_batch_job_submit_and_poll(self, tmp_path):
        import json as _json
        import os

        from aci_export_spark.sync.rest import BatchJob

        job = BatchJob(str(tmp_path), finish_after_polls=3)
        job.post("/lists/abc", {"id": "m1"})
        job.put("/lists/abc/members/m2", {"id": "m2"})
        job.delete("/lists/abc/members/m3")
        sleeps = []
        batch_id = job.run(sleep=sleeps.append)
        # polled until the backend reported finished (T5)
        assert len(sleeps) == 3
        ops_file = os.path.join(str(tmp_path), "batches", f"{batch_id}.jsonl")
        ops = [_json.loads(l) for l in open(ops_file)]
        assert [o["method"] for o in ops] == ["POST", "PUT", "DELETE"]


class TestRestDataSource:
    def test_python_datasource_paged_scan(self, spark):
        import hashlib

        from aci_export_spark.sync import rest_datasource

        rest_datasource.register(spark)
        df = (
            spark.read.format("rest_pages")
            .option("total_count", "2357")
            .option("page_size", "300")
            .load()
        )
        assert df.rdd.getNumPartitions() == 8  # one partition per page
        rows = df.collect()
        assert len(rows) == 2357
        assert {r["page"] for r in rows} == set(range(8))
        r0 = next(r for r in rows if r["email_address"] == "member0@list.test")
        assert r0["id"] == hashlib.md5(b"member0@list.test").hexdigest()
        # composes with the DataFrame API: filter + aggregate over the source
        n_cleaned = df.filter(df.status == "cleaned").count()
        assert n_cleaned == len([i for i in range(2357) if i % 9 == 0])


class TestPipelineCli:
    def test_pipeline_list_and_run(self):
        import io as _io
        import json as _json
        import sys as _sys

        from aci_export_spark import cli

        def run(argv):
            buf = _io.StringIO()
            old = _sys.stdout
            _sys.stdout = buf
            try:
                cli.main(argv)
            finally:
                _sys.stdout = old
            return buf.getvalue()

        listing = _json.loads(run(["pipeline", "list"]))
        assert "flagship_scoped_members" in listing and len(listing) >= 50
        rows = _json.loads(
            run(["pipeline", "run", "q1_pricing_summary",
                 "--sf-dir", "/root/testdata/sf0.001"])
        )
        assert rows and "sum_qty" in rows[0]


class TestObservedSync:
    def test_one_pass_sync_matches_two_pass(self, spark, aci, tmp_path):
        """run_mirror_sync_and_write (observe-based, one job per entity)
        produces the same mirror state and stats as the two-pass path."""
        import os

        from aci_export_spark.sync.app_sync import (
            LOAD_ORDER, load_targets, run_mirror_sync, run_mirror_sync_and_write,
        )

        m1 = str(tmp_path / "m1"); os.makedirs(m1)
        stats1 = run_mirror_sync_and_write(aci, spark, m1, today=TODAY_S)
        post2, stats2 = run_mirror_sync(aci, load_targets(spark, str(tmp_path / "void")), today=TODAY_S)
        for name in LOAD_ORDER:
            assert stats1[name]["upserted"] == stats2[name]["upserted"], name
            assert stats1[name]["deleted"] == stats2[name]["deleted"] == 0, name
            written = spark.read.parquet(os.path.join(m1, f"{name}.parquet"))
            assert written.count() == post2[name].count(), name
        # second one-pass run converges with zero deletes
        stats3 = run_mirror_sync_and_write(aci, spark, m1, today=TODAY_S)
        for name in LOAD_ORDER:
            assert stats3[name]["deleted"] == 0, name


def test_read_jsonl_quarantines_malformed(spark, tmp_path):
    from aci_export_spark.sources import read_jsonl

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id long, text string")
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line and the type mismatch
    assert all(r["doc_id"] is None for r in bad if r["_corrupt_record"] == "this is not json")
