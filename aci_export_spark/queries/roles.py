"""User-role and microsite-admin queries (reference ddb/src/roles.rs).

- `user_roles`: the user__roles link rows (roles.rs:29-32) — flat
  (user_uid, role) pairs, optionally filtered to one role name.
- `microsite_admins`: admin link rows resolved to their managed entity
  (roles.rs:43-66): the reference LEFT-JOINs the same link table twice with
  different bundle filters and emits COALESCE(region, club) + an is_region
  flag — region resolution takes precedence, rows matching neither bundle
  are dropped.

Both joins broadcast the tiny dimension side; the link table is the only
potentially-large input and is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def user_roles(tables: dict[str, DataFrame], role: str | None = None) -> DataFrame:
    out = tables["user_roles"].select("user_uid", "role")
    if role is not None:
        out = out.filter(F.col("role") == role)
    return out


def microsite_admins(tables: dict[str, DataFrame]) -> DataFrame:
    links = tables["microsite_links"]
    regions = tables["regions"].select(F.col("uid").alias("__region_uid"))
    clubs = tables["clubs"].select(F.col("uid").alias("__club_uid"))
    resolved = (
        links.join(
            broadcast(regions), links.target_uid == F.col("__region_uid"), "left"
        )
        .join(broadcast(clubs), links.target_uid == F.col("__club_uid"), "left")
        .withColumn("entity_uid", F.coalesce("__region_uid", "__club_uid"))
        # neither bundle matched → not a microsite entity (reference drops it)
        .filter(F.col("entity_uid").isNotNull())
    )
    return resolved.select(
        "user_uid",
        "entity_uid",
        F.col("__region_uid").isNotNull().alias("is_region"),
    )
