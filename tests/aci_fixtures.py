"""Deterministic ACI-domain fixture generator (seed 42) per FIXTURES.md §A.

Flattened, minimal stand-ins for the reference's Drupal-EAV source tables,
with every edge case the reference semantics depend on:
- email validity edge rows (NULL / '' / noemail.com / example.com)
- duplicate (user, club, join_date, kind) membership paragraphs with
  different paragraph_ids (dedupe-pick keeps MIN)
- per-user ties on max join_date (argmax tie-break)
- users with BOTH regular and affiliate memberships (priority dedup)
- partner links, incl. partners who are also primaries (partner exclusion)
- leadership intervals straddling the as-of probe dates; NULL start (drop);
  orphan entity uids (FK-existence filter); duplicate natural keys
- 0/1/multi addresses; exactly-one vs zero mailing-address users
- CSV brns with stray spaces

Written as parquet into a session tmp dir so Spark and DuckDB read the same
bytes (mirroring the driver's oracle protocol).
"""

from __future__ import annotations

import os
import random
from datetime import date, timedelta

import pandas as pd

SEED = 42
TODAY = date(2026, 8, 13)  # frozen "today" for deterministic date windows

CLASS_LIFETIME_TID = 601
CLASS_COMPLIMENTARY_TID = 602
STATUS_CURRENT = ("947", "1099")
STATUS_LAPSED = ("951",)


def _d(y, m, dd) -> str:
    return date(y, m, dd).isoformat()


def build_fixtures(out_dir: str) -> dict[str, pd.DataFrame]:
    rng = random.Random(SEED)
    os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------------ users
    users = []
    for uid in range(1, 61):
        if uid % 17 == 0:
            mail = None
        elif uid % 13 == 0:
            mail = ""
        elif uid % 11 == 0:
            mail = f"user{uid}@noemail.com"
        elif uid % 19 == 0:
            mail = f"user{uid}@example.com"
        else:
            mail = f"User{uid}@Mail.test "  # mixed case + trailing space (trim/lower path)
        users.append(
            dict(
                uid=uid,
                mail=mail,
                login=1_500_000_000 + uid * 86_400,
                status=0 if uid % 23 == 0 else 1,
                first_name=f"First{uid}" if uid % 7 else None,
                last_name=f"Last{uid}",
                birth_date=_d(1950 + uid % 50, 1 + uid % 12, 1 + uid % 28),
                pass_hash=f"$P$hash{uid}",
                gender=rng.choice(["m", "f", None]),
                race_tid=rng.choice([701, 702, None]),
                blue_beret_mail=rng.choice([True, False, None]),
                publish_info=rng.choice([True, False]),
                special_needs=uid % 9 == 0,
                ada_parking=uid % 21 == 0,
            )
        )
    users_df = pd.DataFrame(users)

    # ---------------------------------------------------------- member_search
    # one row per primary user (uid 1..40); partner_user_id points into 41..60
    # EXCEPT uid 5 whose partner (uid 6) is itself a primary (exclusion edge)
    search = []
    for uid in range(1, 41):
        partner = None
        if uid % 5 == 0:
            partner = 6 if uid == 5 else 40 + (uid % 20) + 1
        status = ["947", "951", "1099", "999"][uid % 4]  # 999 = out-of-domain noise
        u = users[uid - 1]
        pu = users[partner - 1] if partner else None
        search.append(
            dict(
                user_id=uid,
                email=u["mail"],
                first_name=u["first_name"],
                last_name=u["last_name"],
                birthdate=u["birth_date"],
                personal_status_id=status,
                partner_user_id=partner,
                partner_email=(pu["mail"] if pu else None),
                partner_first_name=(pu["first_name"] if pu else None),
                partner_last_name=(pu["last_name"] if pu else None),
                partner_birthdate=(pu["birth_date"] if pu else None),
                membership_expire=_d(2026 + uid % 3, 1 + uid % 12, 15),
                membership_join_year=str(2000 + uid % 20),
            )
        )
    # uid 38 shares uid 2's email (normalizes equal) → email-priority dedup edge
    search[37]["email"] = "user2@mail.test"
    search_df = pd.DataFrame(search)

    # ------------------------------------------------- membership_paragraphs
    paras = []
    pid = 1000

    def para(parent, club, join, leave, kind, cls=None, ptype="membership", status=1):
        nonlocal pid
        pid += 1
        return dict(
            paragraph_id=pid,
            parent_id=parent,
            ptype=ptype,
            status=status,
            club_nid=club,
            join_date=join,
            leave_date=leave,
            membership_class_tid=cls,
            link_kind=kind,
        )

    for uid in range(1, 41):
        club = 1 + uid % 8
        if uid == 22:
            # only membership left 100 days ago: inside the all-members 1y
            # grace window, outside the club query's strict today window
            paras.append(
                para(uid, club, _d(2018, 1, 1),
                     (TODAY - timedelta(days=100)).isoformat(), "field_home_club")
            )
            continue
        if uid == 38:
            # affiliate-ONLY user sharing uid 2's email (set below in search):
            # loses the email-priority dedup to uid 2 in the unscoped query,
            # but survives a club-5-scoped query where uid 2 is out of scope
            # (SURVEY §7.4.3 order-of-operations trap)
            paras.append(para(uid, 5, _d(2021, 2, 2), None, "field_memberships"))
            continue
        if uid == 28:
            # affiliate-only user with its own email (member_type derivation)
            paras.append(para(uid, 1 + (uid + 3) % 8, _d(2021, 2, 2), None,
                              "field_memberships"))
            continue
        # current membership, open-ended
        paras.append(para(uid, club, _d(2020, 1 + uid % 12, 1), None, "field_home_club"))
        if uid % 3 == 0:  # affiliate in another club (priority-dedup edge)
            paras.append(
                para(uid, 1 + (uid + 3) % 8, _d(2021, 2, 2), None, "field_memberships")
            )
        if uid % 4 == 0:  # historical lapsed row
            paras.append(
                para(uid, club, _d(2010, 1, 1), _d(2015, 1, 1), "field_home_club")
            )
        if uid % 6 == 0:  # exact duplicate (different paragraph_id) → dedupe-pick MIN
            paras.append(para(uid, club, _d(2020, 1 + uid % 12, 1), None, "field_home_club"))
        if uid % 10 == 0:  # tie on max join_date in a DIFFERENT club (argmax tie)
            paras.append(
                para(uid, 1 + (uid + 5) % 8, _d(2020, 1 + uid % 12, 1), None, "field_home_club")
            )
        if uid % 8 == 0:  # intraclub membership
            paras.append(
                para(uid, club, _d(2022, 3, 3), None, "field_intraclub_memberships")
            )
        if uid == 7:  # NULL join_date (must be dropped)
            paras.append(para(uid, club, None, None, "field_home_club"))
        if uid == 9:  # future join date (join > today edge)
            paras.append(para(uid, club, _d(2027, 1, 1), None, "field_home_club"))
        if uid == 11:  # left recently (inside the 1y grace window)
            paras.append(
                para(uid, club, _d(2018, 1, 1), (TODAY - timedelta(days=100)).isoformat(),
                     "field_home_club")
            )
        if uid == 13:  # lifetime class
            paras.append(
                para(uid, club, _d(2019, 5, 5), None, "field_home_club", CLASS_LIFETIME_TID)
            )
        if uid == 17:  # complimentary class
            paras.append(
                para(uid, club, _d(2019, 6, 6), None, "field_home_club",
                     CLASS_COMPLIMENTARY_TID)
            )
    # orphan paragraph (no user row) + noise ptype + inactive
    paras.append(para(999, 1, _d(2020, 1, 1), None, "field_home_club"))
    paras.append(para(3, 2, _d(2020, 1, 1), None, "field_home_club", ptype="noise"))
    paras.append(para(4, 2, _d(2020, 1, 1), None, "field_home_club", status=0))
    # international memberships (no club)
    for uid in (2, 4, 6):
        paras.append(
            para(uid, None, _d(2018, 1, 1), None, None, ptype="ssp_international_membership")
        )
    paras_df = pd.DataFrame(paras)

    # ------------------------------------------------------------ clubs/regions
    clubs_df = pd.DataFrame(
        [
            dict(
                uid=c,
                number=(None if c == 8 else 100 + c),
                name=f"Club {c}",
                region_uid=1 + c % 3,
                active=c != 7,
            )
            for c in range(1, 9)
        ]
    )
    regions_df = pd.DataFrame(
        [dict(uid=r, number=10 + r, name=f"Region {r}", active=True) for r in range(1, 4)]
    )

    # -------------------------------------------------------------- taxonomy
    taxonomy_df = pd.DataFrame(
        [
            dict(tid=CLASS_LIFETIME_TID, vid="membership_class", name="Lifetime"),
            dict(tid=CLASS_COMPLIMENTARY_TID, vid="membership_class", name="Complimentary"),
            dict(tid=701, vid="ssp_race", name="Race A"),
            dict(tid=702, vid="ssp_race", name="Race B"),
            dict(tid=801, vid="roles", name="President"),
            dict(tid=802, vid="roles", name="Treasurer"),
        ]
    )

    # ------------------------------------------------------------ leadership
    lead = []
    probe = _d(2024, 6, 15)  # used by as-of tests
    for i, (etype, euid) in enumerate(
        [("ssp_club", 1), ("ssp_club", 2), ("ssp_region", 1), ("ssp_region", 2),
         ("ssp_international_leadership", 0), ("ssp_standing_committees", 901)]
    ):
        base_uid = 2 + i * 3
        # closed interval straddling the probe date
        lead.append(
            dict(entity_uid=euid, entity_type=etype, role_tid=801, role_name="President",
                 user_uid=base_uid, member_uid=None,
                 start_date=_d(2023, 1, 1), end_date=_d(2025, 1, 1))
        )
        # open interval (current)
        lead.append(
            dict(entity_uid=euid, entity_type=etype, role_tid=802, role_name="Treasurer",
                 user_uid=None, member_uid=base_uid + 1,  # coalesce-key path
                 start_date=_d(2024, 1, 1), end_date=None)
        )
        # ended before probe (must drop for current/as-of)
        lead.append(
            dict(entity_uid=euid, entity_type=etype, role_tid=801, role_name="President",
                 user_uid=base_uid + 2, member_uid=None,
                 start_date=_d(2020, 1, 1), end_date=_d(2022, 1, 1))
        )
    # NULL start_date (drop); orphan entity; duplicate natural key
    lead.append(dict(entity_uid=1, entity_type="ssp_club", role_tid=801,
                     role_name="President", user_uid=30, member_uid=None,
                     start_date=None, end_date=None))
    lead.append(dict(entity_uid=777, entity_type="ssp_club", role_tid=801,
                     role_name="President", user_uid=31, member_uid=None,
                     start_date=_d(2024, 1, 1), end_date=None))
    lead.append(dict(entity_uid=2, entity_type="ssp_club", role_tid=802,
                     role_name="Treasurer", user_uid=6, member_uid=None,
                     start_date=_d(2024, 1, 1), end_date=None))  # dup of open row for euid=2
    # committee with NULL role (implicit Chair)
    lead.append(dict(entity_uid=901, entity_type="ssp_standing_committees", role_tid=None,
                     role_name=None, user_uid=33, member_uid=None,
                     start_date=_d(2024, 2, 1), end_date=None))
    leadership_df = pd.DataFrame(lead)

    # ------------------------------------------------------------- addresses
    addr = []
    apid = 5000
    for uid in range(1, 31):
        n = [0, 1, 1, 2, 3][uid % 5]
        for delta in range(n):
            apid += 1
            addr.append(
                dict(
                    paragraph_id=apid,
                    user_uid=uid,
                    delta=delta,
                    street_address=f"{uid * 10 + delta} Main St",
                    street_address_2=None if delta else "Apt 1",
                    city=f"City{uid % 6}",
                    state=["AZ", "OH", "TX"][uid % 3],
                    zip_code=f"{85000 + uid:05d}",
                    country="US",
                    is_primary=delta == 0,
                    # every user with ≥1 address has exactly one mailing addr,
                    # except uid%7==0 users who have none
                    is_mailing_address=(delta == n - 1) and uid % 7 != 0,
                )
            )
    addresses_df = pd.DataFrame(addr)

    # ------------------------------------------------------------------ brns
    brns_df = pd.DataFrame(
        [
            dict(user_id=uid, brns_values=" 123, 456 ,789" if uid % 2 else f"{uid}00")
            for uid in range(1, 21)
        ]
    )
    brn_numbers_df = pd.DataFrame(
        [
            dict(user_id=uid, number=n.strip())
            for uid in range(1, 21)
            for n in ((" 123, 456 ,789" if uid % 2 else f"{uid}00").split(","))
        ]
    )

    # ------------------------------------------------------------ airstreams
    air = []
    for aid in range(1, 16):
        owner_changes = 1 + aid % 3
        for j in range(owner_changes):
            air.append(
                dict(
                    airstream_id=aid,
                    paragraph_id=7000 + aid * 10 + j,
                    user_id=(aid + j) % 40 + 1 if aid % 5 else None,
                    include_partner=bool((aid + j) % 2),
                    join_date=_d(2015 + j * 2, 1, 1),
                    leave_date=None if j == owner_changes - 1 else _d(2015 + j * 2 + 1, 12, 31),
                    vin=f"VIN{aid:05d}",
                    model=rng.choice(["Flying Cloud", "Bambi", None]),
                    rig_type=rng.choice(["Trailer", "Class A", "Class B"]),
                    year=1990 + aid,
                    length=round(16.0 + aid * 1.5, 2),
                )
            )
    airstreams_df = pd.DataFrame(air)

    # ------------------------------------------------- mailchimp remote state
    import hashlib

    def mc_id(email: str) -> str:
        return hashlib.md5(email.lower().strip().encode()).hexdigest()

    audience = []
    for uid in range(1, 25):
        u = users[uid - 1]
        if not u["mail"] or u["mail"].strip() == "":
            continue
        audience.append(
            dict(
                id=mc_id(u["mail"]),
                email_address=u["mail"].strip().lower(),
                status="cleaned" if uid % 9 == 0 else "subscribed",
            )
        )
    # stale remote-only members (must be deleted by retain; one cleaned → kept)
    audience.append(dict(id=mc_id("gone1@x.test"), email_address="gone1@x.test", status="subscribed"))
    audience.append(dict(id=mc_id("gone2@x.test"), email_address="gone2@x.test", status="cleaned"))
    audience_df = pd.DataFrame(audience)

    merge_field_defs_df = pd.DataFrame(
        [
            dict(tag="FNAME", name="First Name", type="text"),
            dict(tag="LNAME", name="Last Name", type="text"),
            dict(tag="BDAY", name="Birthday", type="birthday"),
            dict(tag="JOINED", name="Join Date", type="date"),
            dict(tag="CLUBNUM", name="Club Number", type="number"),
            dict(tag="WAYTOOLONGTAG", name="Invalid", type="text"),  # >10 chars → reject
        ]
    )
    remote_merge_fields_df = pd.DataFrame(
        [
            dict(tag="FNAME", name="First Name", type="text"),          # unchanged
            dict(tag="LNAME", name="Surname", type="text"),             # update (name)
            dict(tag="OBSOLETE", name="Old Field", type="text"),        # delete
            # BDAY/JOINED/CLUBNUM missing → create
        ]
    )

    # -------------------------------------------- roles / microsite admins
    # user__roles rows (ddb/src/roles.rs:29-32); some users have several
    user_roles_df = pd.DataFrame(
        [
            dict(user_uid=uid, role=role)
            for uid in range(1, 31)
            for role in (["member"] + (["webmaster"] if uid % 6 == 0 else [])
                         + (["administrator"] if uid % 15 == 0 else []))
        ]
    )
    # microsite admin link rows: one target entity per row, resolved against
    # regions first then clubs with COALESCE (ddb/src/roles.rs:43-66).
    # Fixture edges: targets 4..8 are club-only uids; 1..3 exist in BOTH uid
    # spaces and must resolve as regions (the reference's coalesce order);
    # uid 24's extra row links a dangling entity (no bundle matches → drop).
    microsite = []
    for uid in range(1, 31):
        if uid % 6 == 0:  # webmasters administer a club site
            microsite.append(dict(user_uid=uid, target_uid=4 + uid % 5))
        if uid % 15 == 0:  # some also administer their region site
            microsite.append(dict(user_uid=uid, target_uid=1 + uid % 3))
    microsite.append(dict(user_uid=24, target_uid=99999))  # dangling target
    microsite_links_df = pd.DataFrame(microsite)

    frames = dict(
        users=users_df,
        member_search=search_df,
        membership_paragraphs=paras_df,
        clubs=clubs_df,
        regions=regions_df,
        taxonomy=taxonomy_df,
        leadership=leadership_df,
        addresses=addresses_df,
        brns=brns_df,
        brn_numbers=brn_numbers_df,
        airstreams=airstreams_df,
        mailchimp_audience=audience_df,
        merge_field_defs=merge_field_defs_df,
        remote_merge_fields=remote_merge_fields_df,
        user_roles=user_roles_df,
        microsite_links=microsite_links_df,
    )
    for name, df in frames.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
    return frames
