"""Semantic parity tests for the ACI-domain query library over the
deterministic fixtures — the correctness harness the reference never had
(SURVEY.md §5), focused on the §7.4 semantic traps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aci_export_spark.queries import members as M
from aci_export_spark.queries import leadership as L
from aci_export_spark.queries import entities as E
from tests.aci_fixtures import build_fixtures, TODAY


@pytest.fixture(scope="session")
def aci(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aci_fixtures"))
    build_fixtures(out)
    from aci_export_spark.queries.catalog import load_catalog

    return load_catalog(spark, out)


TODAY_S = TODAY.isoformat()


class TestMembers:
    def test_partner_exclusion(self, aci):
        # uid 6 is uid 5's partner AND a primary row → excluded (P7)
        rows = {r.user_id for r in M.members(aci, today=TODAY_S).select("user_id").collect()}
        assert 6 not in rows
        assert 5 in rows

    def test_status_domain_filter(self, aci):
        # personal_status_id 999 (uid%4==3) is out of domain → excluded (P4)
        rows = M.members(aci, today=TODAY_S).select("user_id", "member_status").collect()
        ids = {r.user_id for r in rows}
        assert 3 not in ids and 7 not in ids
        by_id = {r.user_id: r.member_status for r in rows}
        assert by_id[1] == "lapsed"  # 951
        assert by_id[4] == "current"  # 947
        assert by_id[2] == "current"  # 1099

    def test_email_priority_dedup_unscoped(self, aci):
        # uid 38 (affiliate) shares uid 2's email → regular uid 2 wins (A4)
        rows = {r.user_id for r in M.members(aci, today=TODAY_S).select("user_id").collect()}
        assert 2 in rows
        assert 38 not in rows

    def test_scope_dedup_interaction(self, aci):
        # SURVEY §7.4.3: in a club-5 scope, uid 2 (same email, other club) is
        # not in the result set, so affiliate uid 38 survives
        rows = {r.user_id for r in M.members(aci, club=5, today=TODAY_S).select("user_id").collect()}
        assert 38 in rows
        assert 2 not in rows

    def test_member_type_derivation(self, aci):
        by_id = {
            r.user_id: r.member_type
            for r in M.members(aci, today=TODAY_S).select("user_id", "member_type").collect()
        }
        assert by_id[28] == "affiliate"  # affiliate-only user
        assert by_id[4] == "regular"

    def test_liveness_windows_diverge(self, aci):
        # uid 22 left 100 days ago: in the all query (1y grace), out of the
        # strict club query (SURVEY §7.4.4)
        all_ids = {r.user_id for r in M.members(aci, today=TODAY_S).select("user_id").collect()}
        club7 = {r.user_id for r in M.members(aci, club=7, today=TODAY_S).select("user_id").collect()}
        assert 22 in all_ids
        assert 22 not in club7

    def test_argmax_tie_break(self, aci):
        # uid 10 has two open memberships with the same join_date (clubs 3 and
        # 8); deterministic pick = lowest paragraph_id = the club-3 row
        row = M.members(aci, today=TODAY_S).filter(F.col("user_id") == 10).collect()[0]
        assert row.club_uid == 3

    def test_dedupe_pick_min_paragraph(self, aci):
        # uid 12 has an exact duplicate membership paragraph → history keeps 1
        hist = M.membership_history(aci, user_uid=12).collect()
        keys = [(r.user_uid, r.club_uid, str(r.join_date), r.member_type) for r in hist]
        assert len(keys) == len(set(keys))

    def test_partner_struct_and_brns(self, aci):
        rows = {r.user_id: r for r in M.members(aci, today=TODAY_S).collect()}
        assert rows[5].partner is not None and rows[5].partner.uid == 6
        assert rows[4].partner is None
        assert rows[1].brn_numbers == ["123", "456", "789"]
        assert rows[2].brn_numbers == ["200"]

    def test_member_class_decode(self, aci):
        by_id = {
            r.user_id: r.member_class
            for r in M.members(aci, today=TODAY_S).select("user_id", "member_class").collect()
        }
        # uid 13: lifetime para joined 2019 (not the latest pick → Regular);
        # picked row class defaults to Regular when tid is NULL
        assert by_id[4] == "Regular"
        assert by_id[17] in ("Regular", "Complimentary")

    def test_point_lookups(self, aci):
        assert M.member_by_uid(aci, 4, today=TODAY_S).count() == 1
        got = M.member_by_email(aci, "user4@mail.test", today=TODAY_S).collect()
        assert len(got) == 1 and got[0].user_id == 4


class TestLeadership:
    def test_null_start_dropped_and_coalesce_person(self, aci):
        rows = L.leadership(aci).collect()
        assert all(r.start_date is not None for r in rows)
        persons = {r.person_uid for r in rows}
        assert 30 not in persons  # NULL start row dropped
        assert 6 in persons  # member_uid-only person (coalesce key)

    def test_as_of_inclusive_endpoints(self, aci):
        # closed interval 2023-01-01 → 2025-01-01: both endpoints inclusive
        at_end = L.leadership(aci, L.ENTITY_CLUB, 1, date_filter="as_of", as_of="2025-01-01")
        assert any(r.person_uid == 2 for r in at_end.collect())
        after = L.leadership(aci, L.ENTITY_CLUB, 1, date_filter="as_of", as_of="2025-01-02")
        assert not any(r.person_uid == 2 for r in after.collect())

    def test_current_filter(self, aci):
        cur = L.leadership(aci, L.ENTITY_CLUB, 1, date_filter="current").collect()
        assert {r.person_uid for r in cur} == {3}  # only the open interval

    def test_committee_implicit_chair(self, aci):
        com = L.leadership(aci, L.ENTITY_COMMITTEE, 901).collect()
        chair = [r for r in com if r.person_uid == 33]
        assert chair and chair[0].role_uid == 0 and chair[0].role_name == "Chair"

    def test_dedup_for_upsert(self, aci):
        lead = L.leadership(aci, L.ENTITY_CLUB, 2)
        deduped = L.dedup_for_upsert(lead)
        keys = [
            (r.entity_uid, r.person_uid, r.role_uid, str(r.start_date))
            for r in deduped.collect()
        ]
        assert len(keys) == len(set(keys))
        assert lead.count() > deduped.count()  # the fixture dup was dropped

    def test_fk_existence_filter(self, aci):
        lead = L.leadership(aci, L.ENTITY_CLUB)
        kept = L.filter_to_existing_entities(lead, aci["clubs"])
        assert lead.count() - kept.count() == 1  # orphan entity 777 dropped

    def test_by_number_resolves_via_semi_join(self, aci):
        # club uid=1 carries number 101; the number-resolved result must equal
        # the direct uid lookup, with no eager driver action in the plan
        by_num = L.leadership_by_number(aci, L.ENTITY_CLUB, 101)
        by_uid = L.leadership(aci, L.ENTITY_CLUB, entity_uid=1)
        assert sorted(map(tuple, by_num.collect())) == sorted(map(tuple, by_uid.collect()))
        assert by_num.count() > 0
        assert L.leadership_by_number(aci, L.ENTITY_CLUB, 99999).count() == 0


class TestEntities:
    def test_users_excludes_pass(self, aci):
        df = E.users(aci)
        assert "pass" not in df.columns and "pass_hash" not in df.columns
        row = E.users(aci, uid=1).collect()[0]
        assert row.last_login is not None and row.active

    def test_addresses_order_and_mailing(self, aci):
        rows = E.addresses(aci, user_uid=4).collect()
        assert [r.delta for r in rows] == sorted(r.delta for r in rows)
        # uid%7==0 users have no mailing address
        assert E.addresses(aci, user_uid=7, mailing_only=True).count() == 0
        assert E.addresses(aci, user_uid=4, mailing_only=True).count() == 1

    def test_airstreams_decimal(self, aci):
        df = E.airstreams(aci, user_uid=None)
        assert dict(df.dtypes)["length"] == "decimal(5,2)"

    def test_brns_roundtrip(self, aci):
        wide = {r.user_id: r.brn_numbers for r in E.brns_wide(aci).collect()}
        assert wide[1] == ["123", "456", "789"]
        rebuilt = {r.user_id: r.brns_values for r in E.brns_rebuild_csv(aci).collect()}
        assert rebuilt[1] == "123,456,789"
        assert rebuilt[2] == "200"

    def test_clubs_regions_races(self, aci):
        assert E.clubs(aci, number=103).collect()[0].uid == 3
        assert E.clubs(aci).count() == 7  # active only (club 7 inactive)
        assert E.regions(aci).count() == 3
        races = E.races(aci).collect()
        assert [r.uid for r in races] == sorted(r.uid for r in races)


class TestRoles:
    def test_user_roles_and_filter(self, aci):
        from aci_export_spark.queries import roles as R

        all_roles = R.user_roles(aci)
        assert all_roles.filter(F.col("role") == "member").count() == 30
        webmasters = R.user_roles(aci, role="webmaster")
        assert {r["user_uid"] % 6 for r in webmasters.collect()} == {0}

    def test_microsite_admin_resolution(self, aci):
        from aci_export_spark.queries import roles as R

        admins = {(r["user_uid"], r["entity_uid"]): r["is_region"]
                  for r in R.microsite_admins(aci).collect()}
        # dangling target dropped (roles.rs: no bundle matched)
        assert not any(uid == 99999 for (_, uid) in admins)
        # targets 1..3 exist in both uid spaces → region precedence
        assert all(is_region for (_, uid), is_region in admins.items() if uid <= 3)
        # club-only targets resolve with is_region=False
        assert any(not is_region for (_, uid), is_region in admins.items() if uid >= 4)
        # uid 30 (both %6 and %15) administers a club AND a region site
        assert {uid for (u, uid) in admins if u == 30} == {4 + 30 % 5, 1 + 30 % 3}
