"""Simple entity queries: users, clubs, regions, races, addresses,
airstreams, brns (reference ddb/src/{users,clubs,regions,races,addresses,
airstreams}.rs). Each is a filter/projection over one base scan plus the
reference's decode semantics; P12 parameterization as keyword filters."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aci_export_spark.functions.dates import epoch_to_date
from aci_export_spark.functions.text import split_csv_trim


def users(
    tables: dict[str, DataFrame],
    uid: int | None = None,
    email: str | None = None,
    active_only: bool = False,
) -> DataFrame:
    """User projection (P1 pivot result shape, ddb/src/users.rs:55-97).
    `pass` is intentionally NOT selected — serialization-excluded in the
    reference (ddb/src/users.rs:26-28 serde skip)."""
    u = tables["users"]
    out = u.select(
        "uid",
        F.col("mail").alias("email"),
        "first_name",
        "last_name",
        F.to_date("birth_date").alias("birthday"),
        epoch_to_date(F.col("login")).alias("last_login"),
        "gender",
        "race_tid",
        F.coalesce(F.col("blue_beret_mail"), F.lit(False)).alias("blue_beret_mail"),
        F.col("publish_info"),
        F.col("special_needs"),
        F.col("ada_parking"),
        (F.col("status") == 1).alias("active"),
    )
    if uid is not None:
        out = out.filter(F.col("uid") == uid).limit(1)
    if email is not None:
        out = out.filter(F.lower(F.trim(F.col("email"))) == email.strip().lower()).limit(1)
    if active_only:
        out = out.filter(F.col("active"))
    return out


def clubs(
    tables: dict[str, DataFrame],
    uid: int | None = None,
    number: int | None = None,
    region: int | None = None,
    active_only: bool = True,
) -> DataFrame:
    """Club query (ddb/src/clubs.rs:34-45): type/status filters became the
    fixture's `active` flag; by-uid/by-number lookups are P12 params."""
    c = tables["clubs"].select(
        "uid", "number", "name", F.col("region_uid").alias("region"), "active"
    )
    if active_only:
        c = c.filter(F.col("active"))
    if uid is not None:
        c = c.filter(F.col("uid") == uid).limit(1)
    if number is not None:
        c = c.filter(F.col("number") == number).limit(1)
    if region is not None:
        c = c.filter(F.col("region") == region)
    return c


def regions(
    tables: dict[str, DataFrame], uid: int | None = None, number: int | None = None
) -> DataFrame:
    r = tables["regions"].select("uid", "number", "name", "active")
    if uid is not None:
        r = r.filter(F.col("uid") == uid).limit(1)
    if number is not None:
        r = r.filter(F.col("number") == number).limit(1)
    return r


def races(tables: dict[str, DataFrame]) -> DataFrame:
    """Taxonomy scan (ddb/src/races.rs:13-26): vid filter + ORDER BY tid."""
    return (
        tables["taxonomy"]
        .filter(F.col("vid") == "ssp_race")
        .select(F.col("tid").alias("uid"), "name")
        .orderBy("uid")
    )


def addresses(
    tables: dict[str, DataFrame],
    user_uid: int | None = None,
    mailing_only: bool = False,
) -> DataFrame:
    """Address query (ddb/src/addresses.rs:37-89): delta ordering within user
    (O1), mailing-address filter (P11), per-user lookup (J8)."""
    a = tables["addresses"]
    if user_uid is not None:
        a = a.filter(F.col("user_uid") == user_uid)
    if mailing_only:
        a = a.filter(F.coalesce(F.col("is_mailing_address"), F.lit(False)))
    return a.select(
        "paragraph_id", "user_uid", "delta", "street_address", "street_address_2",
        "city", "state", "zip_code", "country",
        F.coalesce(F.col("is_primary"), F.lit(False)).alias("is_primary"),
        F.coalesce(F.col("is_mailing_address"), F.lit(False)).alias("is_mailing_address"),
    ).orderBy("user_uid", "delta")


def airstreams(tables: dict[str, DataFrame], user_uid: int | None = None) -> DataFrame:
    """Airstream ownership periods (ddb/src/airstreams.rs:42-78). `length`
    kept as DECIMAL(5,2) — real decimals instead of the reference's
    string-carried MySQL DECIMAL (SURVEY §1.5)."""
    a = tables["airstreams"]
    if user_uid is not None:
        a = a.filter(F.col("user_uid") == user_uid)
    return a.select(
        "airstream_id", "paragraph_id", "user_id", "include_partner",
        F.to_date("join_date").alias("join_date"),
        F.to_date("leave_date").alias("leave_date"),
        "vin", "model", "rig_type", "year",
        F.col("length").cast("decimal(5,2)").alias("length"),
    )


def brns_wide(tables: dict[str, DataFrame]) -> DataFrame:
    """v_brns view consumption: CSV → array<string> (F9/A8,
    ddb/src/members.rs:1045-1059)."""
    return tables["brns"].select(
        "user_id", split_csv_trim(F.col("brns_values")).alias("brn_numbers")
    )


def brns_rebuild_csv(tables: dict[str, DataFrame]) -> DataFrame:
    """The reverse direction: normalized brn rows → per-user sorted CSV — the
    reconstruction of the external v_brns view itself (SURVEY §7.4.7a)."""
    return (
        tables["brn_numbers"]
        .groupBy("user_id")
        .agg(F.array_join(F.array_sort(F.collect_list("number")), ",").alias("brns_values"))
    )
