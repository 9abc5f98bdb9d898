"""Member queries — the reference's most complex surface
(`ddb/src/members.rs`, esp. FETCH_CLUB_MEMBERS_QUERY :362-520 and the
all-members query :432-520). Re-expressed as one shared lazy plan with
parameterized scope, matching the reference's semantics exactly:

- member periods come from membership paragraphs (dedupe-pick keeps MIN
  paragraph_id per natural key — A2, :240-258);
- two liveness windows (SURVEY §7.4.4): the *all* query uses
  join ≤ today AND (leave IS NULL OR leave ≥ today − 1y) (:344-345); the
  *club/region* query uses join ≤ today AND (leave IS NULL OR leave ≥ today)
  (:393-395);
- member existence requires ≥1 membership link (P6, :346-348);
- users who are someone's partner are excluded as primary rows (P7, :349);
- per-user pick = argmax join_date (A3, :421-430) with deterministic
  MIN-paragraph_id tie-break (the reference kept SQL ties — SURVEY §7.4.1);
- member_type: any active home/intraclub link → regular, else affiliate
  (:201-206, 698-710; intraclub collapses into regular on the target side
  :759-766);
- member_status decode: 947/1099 → current, 951 → lapsed (:666-677);
- member_class from taxonomy term name, default Regular (:603-634);
- email-priority dedup LAST (A4, :41-55): regular beats affiliate, tie =
  lowest uid; runs after scope filtering (SURVEY §7.4.3);
- partner synthesized from the search row's partner_* columns as a nested
  struct, NULL when no partner (:983-1022).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.functions.text import split_csv_trim
from aci_export_spark.operators.dedup import argmax_per_key, dedupe_keep_min, priority_dedup

STATUS_CURRENT = ("947", "1099")
STATUS_LAPSED = ("951",)
STATUS_ALL = STATUS_CURRENT + STATUS_LAPSED

REGULAR_KINDS = ("field_home_club", "field_intraclub_memberships")
AFFILIATE_KIND = "field_memberships"


def _today(today: str | None) -> Column:
    return F.lit(today).cast("date") if today else F.current_date()


def membership_periods(tables: dict[str, DataFrame]) -> DataFrame:
    """Cleaned membership periods: one row per (user, club, join_date, kind)
    with member_type/member_class decoded. Reference :193-259."""
    paras = tables["membership_paragraphs"]
    taxonomy = tables["taxonomy"]

    base = paras.filter(
        (F.col("ptype") == "membership")
        & (F.col("status") == 1)
        & F.col("join_date").isNotNull()
        & F.col("link_kind").isNotNull()
    )
    # A2 dedupe-pick: keep MIN paragraph_id per natural key
    deduped = dedupe_keep_min(
        base, ["parent_id", "club_nid", "join_date", "link_kind"], "paragraph_id"
    )
    member_type = (
        F.when(F.col("link_kind") == "field_home_club", "regular")
        .when(F.col("link_kind") == "field_intraclub_memberships", "intraclub")
        .when(F.col("link_kind") == AFFILIATE_KIND, "affiliate")
    )
    classes = taxonomy.filter(F.col("vid") == "membership_class").select(
        F.col("tid").alias("membership_class_tid"), F.col("name").alias("class_name")
    )
    return (
        deduped.join(broadcast(classes), on="membership_class_tid", how="left")
        .withColumn("member_type", member_type)
        .withColumn("member_class", F.coalesce(F.col("class_name"), F.lit("Regular")))
        .select(
            "paragraph_id",
            F.col("parent_id").alias("user_uid"),
            F.col("club_nid").alias("club_uid"),
            F.to_date("join_date").alias("join_date"),
            F.to_date("leave_date").alias("leave_date"),
            "member_type",
            "member_class",
        )
    )


def _active_periods(periods: DataFrame, today: Column, grace_months: int | None) -> DataFrame:
    """Liveness windows (SURVEY §7.4.4). grace_months=None → strict today
    window (club query); 12 → the all-members 1-year grace window."""
    leave_ok = (
        F.col("leave_date").isNull()
        | (F.col("leave_date") >= (F.add_months(today, -grace_months) if grace_months else today))
    )
    return periods.filter((F.col("join_date") <= today) & leave_ok)


def members(
    tables: dict[str, DataFrame],
    club: int | None = None,
    region: int | None = None,
    statuses: tuple[str, ...] = STATUS_ALL,
    today: str | None = None,
) -> DataFrame:
    """The member query, all three scopes (unscoped / club / region) from one
    plan — the reference's UNION-IN scope pattern (J5, :381-392) as a
    broadcast semi-join; P12 parameterization as function args."""
    search = tables["member_search"]
    clubs = tables["clubs"]
    brns = tables["brns"]
    periods = membership_periods(tables)
    t = _today(today)

    scoped = club is not None or region is not None
    if scoped:
        # J5: scope = single club ∪ clubs-of-region
        club_keys = clubs.filter(F.col("uid") == F.lit(club if club is not None else -1))
        region_clubs = clubs.filter(
            F.col("region_uid") == F.lit(region if region is not None else -1)
        )
        scope = (
            club_keys.select(F.col("uid").alias("club_uid"))
            .unionByName(region_clubs.select(F.col("uid").alias("club_uid")))
            .distinct()
        )
        periods = periods.join(broadcast(scope), on="club_uid", how="left_semi")
        active = _active_periods(periods, t, grace_months=None)
    else:
        active = _active_periods(periods, t, grace_months=12)

    # A1 flags + A3 argmax pick over the scope-filtered active periods
    flags = active.groupBy(F.col("user_uid").alias("user_id")).agg(
        (F.max(F.col("member_type").isin(*("regular", "intraclub")).cast("int")) == 1).alias(
            "has_regular_link"
        ),
        (F.max((F.col("member_type") == "affiliate").cast("int")) == 1).alias(
            "has_affiliate_link"
        ),
        F.max("join_date").alias("latest_join"),
        F.max("leave_date").alias("latest_leave"),
    )
    picked = argmax_per_key(
        active, ["user_uid"], "join_date", tie_break=[F.col("paragraph_id").asc()]
    ).select(
        F.col("user_uid").alias("user_id"),
        F.col("club_uid").alias("picked_club_uid"),
        F.col("member_class"),
        F.col("join_date").alias("picked_join_date"),
    )

    # P4 status domain filter
    rows = search.filter(F.col("personal_status_id").isin(*statuses))
    # P7 partner exclusion: drop primaries who are someone's partner
    partner_ids = search.filter(F.col("partner_user_id").isNotNull()).select(
        F.col("partner_user_id").alias("user_id")
    )
    # no broadcast hint: partner_ids derives from the fact table, so a forced
    # broadcast would blow up at scale — AQE picks broadcast at runtime when
    # the distinct set is actually small
    rows = rows.join(partner_ids.distinct(), on="user_id", how="left_anti")
    # P6 membership-link existence + flags join (inner: must have ≥1 active link)
    rows = rows.join(flags, on="user_id", how="inner").join(picked, on="user_id", how="inner")

    member_type = F.when(F.col("has_regular_link"), "regular").otherwise("affiliate")
    member_status = (
        F.when(F.col("personal_status_id").isin(*STATUS_CURRENT), "current")
        .when(F.col("personal_status_id").isin(*STATUS_LAPSED), "lapsed")
    )

    club_dim = clubs.select(
        F.col("uid").alias("picked_club_uid"),
        F.col("number").alias("club_number"),
        F.col("name").alias("club_name"),
        F.col("region_uid").alias("club_region"),
    )
    brn_arr = brns.select(
        F.col("user_id"), split_csv_trim(F.col("brns_values")).alias("brn_numbers")
    )

    partner = F.when(
        F.col("partner_user_id").isNotNull(),
        F.struct(
            F.col("partner_user_id").alias("uid"),
            F.col("partner_email").alias("email"),
            F.col("partner_first_name").alias("first_name"),
            F.col("partner_last_name").alias("last_name"),
            F.to_date("partner_birthdate").alias("birthdate"),
        ),
    ).alias("partner")

    out = (
        rows.join(broadcast(club_dim), on="picked_club_uid", how="left")
        .join(brn_arr, on="user_id", how="left")
        .select(
            "user_id",
            "email",
            "first_name",
            "last_name",
            F.to_date("birthdate").alias("birthdate"),
            member_status.alias("member_status"),
            member_type.alias("member_type"),
            F.col("member_class"),
            F.col("picked_join_date").alias("join_date"),
            F.to_date("membership_expire").alias("expiration_date"),
            F.col("picked_club_uid").alias("club_uid"),
            "club_number",
            "club_name",
            "club_region",
            partner,
            F.coalesce(F.col("brn_numbers"), F.array().cast("array<string>")).alias(
                "brn_numbers"
            ),
        )
    )

    # A4 email-priority dedup — AFTER scope filtering (SURVEY §7.4.3).
    # Rows with no usable email (NULL or '') get a per-user fallback key: the
    # reference's HashMap would collide all ''-email members arbitrarily
    # (nondeterministic winner); keeping them distinct is the deterministic
    # reading of "dedup by email".
    norm_email = F.lower(F.trim(F.col("email")))
    email_key = F.when(
        norm_email.isNull() | (norm_email == ""),
        F.concat(F.lit("\x00uid:"), F.col("user_id")),
    ).otherwise(norm_email)
    priority = F.when(F.col("member_type") == "regular", 0).otherwise(1)
    return priority_dedup(
        out, key=[email_key], priority=priority, tie_break=[F.col("user_id").asc()]
    )


def member_by_uid(tables: dict[str, DataFrame], uid: int, **kw) -> DataFrame:
    """P12 point lookup (reference :57-67)."""
    return members(tables, **kw).filter(F.col("user_id") == uid).limit(1)


def member_by_email(tables: dict[str, DataFrame], email: str, **kw) -> DataFrame:
    """P12 point lookup by normalized email (reference :69-78)."""
    return (
        members(tables, **kw)
        .filter(F.lower(F.trim(F.col("email"))) == email.strip().lower())
        .limit(1)
    )


def membership_history(tables: dict[str, DataFrame], user_uid: int | None = None) -> DataFrame:
    """Full per-user membership period history (reference :84-110, 193-259):
    the deduped periods, ordered; optionally one user's."""
    periods = membership_periods(tables)
    if user_uid is not None:
        periods = periods.filter(F.col("user_uid") == user_uid)
    return periods.orderBy("user_uid", "join_date", "paragraph_id")
