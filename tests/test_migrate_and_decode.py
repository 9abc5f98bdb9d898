"""S14 migrations runner, S15 health ping, F13 sanitize, F14/F15 tolerant
REST decode."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from aci_export_spark.sync.migrate import (
    migration_info,
    new_migration,
    run_migrations,
    sanitize_migration_name,
)
from aci_export_spark.sync.rest import (
    JournalingMailchimpClient,
    coerce_rest_page,
    health_ping,
    paged_rest_source,
)


def test_sanitize_migration_name():
    # reference sync-app/src/cmd/migrate.rs:98-104
    assert sanitize_migration_name("Add USER table!") == "add_user_table"
    assert sanitize_migration_name("fix-bug #42") == "fixbug_42"


def test_migrations_run_info_idempotent(spark, tmp_path):
    mdir = str(tmp_path / "migrations")
    track = str(tmp_path / "_migrations")
    p1 = new_migration(mdir, "create views", timestamp="20240101000000")
    with open(p1, "w") as f:
        f.write(
            "CREATE OR REPLACE TEMP VIEW mig_v1 AS SELECT 1 AS x;\n"
            "CREATE OR REPLACE TEMP VIEW mig_v2 AS SELECT 2 AS x;"
        )
    p2 = new_migration(mdir, "second step", timestamp="20240102000000")
    with open(p2, "w") as f:
        f.write("CREATE OR REPLACE TEMP VIEW mig_v3 AS SELECT x + 1 AS x FROM mig_v1")

    ran = run_migrations(spark, mdir, track)
    assert ran == [20240101000000, 20240102000000]
    assert spark.sql("SELECT x FROM mig_v3").collect()[0]["x"] == 2

    # idempotent replay; a new pending file shows in info and then runs
    assert run_migrations(spark, mdir, track) == []
    p3 = new_migration(mdir, "Third! Step", timestamp="20240103000000")
    with open(p3, "w") as f:
        f.write("CREATE OR REPLACE TEMP VIEW mig_v4 AS SELECT 4 AS x")
    info = migration_info(spark, mdir, track)
    assert [v for v, _ in info["applied"]] == [20240101000000, 20240102000000]
    assert info["pending"] == [(20240103000000, "third_step")]
    assert run_migrations(spark, mdir, track) == [20240103000000]


def test_health_ping(tmp_path):
    client = JournalingMailchimpClient(str(tmp_path))
    assert health_ping(client) == {"health_status": "Everything's Chimpy!"}

    class NullClient:
        def ping(self):
            return {"health_status": None}

    # reference deserialize_null_string: null decodes to ""
    assert health_ping(NullClient()) == {"health_status": ""}


def test_coerce_rest_page_tolerant_decode():
    # reference mailchimp/src/lib.rs:456-568: absent → NULL, numeric strings
    # parse, junk nulls the field (not the page), extras ignored
    struct = StructType.fromDDL(
        "id bigint, email string, rating double, active boolean, note string"
    )
    rows = [
        {"id": "17", "email": "a@x", "rating": "4.5", "active": "true"},
        {"id": 3.7, "email": 12345, "rating": "junk", "active": "nope", "extra": 1},
        {"email": None, "active": 0},
    ]
    pdf = coerce_rest_page(rows, struct)
    assert list(pdf.columns) == ["id", "email", "rating", "active", "note"]
    assert int(pdf["id"][0]) == 17 and int(pdf["id"][1]) == 4
    assert pdf["id"].isna()[2]
    assert pdf["email"][1] == "12345" and pdf["email"].isna()[2]
    assert pdf["rating"][0] == 4.5 and pdf["rating"].isna()[1]
    assert pdf["active"][0] is True and pdf["active"][1] is None
    assert pdf["active"][2] is False
    assert pdf["note"].isna().all()


def test_paged_rest_source_survives_malformed_payload(spark):
    """A page mixing clean and malformed records flows through the Spark
    source: bad values become NULLs, the ingest never fails (F14/F15)."""

    def fetch_page(offset: int, count: int) -> list[dict]:
        if offset == 0:
            return [
                {"id": 1, "email_address": "a@x", "rating": 1.5},
                {"id": "2", "email_address": 7, "rating": "oops"},
            ]
        return [{"email_address": "c@x"}]

    df = paged_rest_source(
        spark,
        fetch_page,
        total_count=2,
        schema="id bigint, email_address string, rating decimal(18,2)",
        page_size=1,
    )
    rows = {r["email_address"]: r for r in df.collect()}
    assert rows["a@x"]["id"] == 1 and float(rows["a@x"]["rating"]) == 1.5
    assert rows["7"]["id"] == 2 and rows["7"]["rating"] is None
    assert rows["c@x"]["id"] is None
