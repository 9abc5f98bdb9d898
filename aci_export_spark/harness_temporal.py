"""Harness entries for the temporal join operators (as-of join, range join)
over the `events` table. These extend the reference's interval logic
(`ddb/src/leadership.rs:95-122`) into first-class distributed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aci_export_spark.harness import register
from aci_export_spark.sources import read_table
from aci_export_spark.operators.asof import asof_join, latest_per_key_ts
from aci_export_spark.operators.range_join import bucketed_range_join, keyed_range_join

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_SQL_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "asof_click_to_view",
    f"""
WITH clicks AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), views AS (
    SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
    ) WHERE rn = 1
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '{_SQL_TS_FMT}') AS click_ts,
       v.event_id AS view_event_id,
       strftime(v.ts, '{_SQL_TS_FMT}') AS view_ts
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
""",
    doc="as-of join: each click attached to the user's latest prior (or "
    "simultaneous) view; union+window single-shuffle plan, right side "
    "pre-deduped per (user, ts) for determinism",
)
def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = latest_per_key_ts(
        ev.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("ts").alias("view_ts_raw"),
            F.col("event_id").alias("view_event_id"),
        ),
        key=["user_id"],
        ts="view_ts_raw",
        tie="view_event_id",
    )
    joined = asof_join(
        clicks,
        views,
        key=["user_id"],
        left_ts="ts",
        right_ts="view_ts_raw",
        right_payload=["view_event_id", "view_ts_raw"],
        right_tie="view_event_id",
        how="left",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts"),
        "view_event_id",
        F.date_format("view_ts_raw", _TS_FMT).alias("view_ts"),
    )


@register(
    "range_user_error_windows",
    """
WITH intervals AS (
    SELECT event_id AS interval_id, user_id, ts AS w_start,
           ts + INTERVAL 10 MINUTE AS w_end
    FROM events WHERE event_type = 'error' AND value > 45
)
SELECT i.interval_id, i.user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM intervals i
JOIN events e ON e.user_id = i.user_id
            AND e.ts >= i.w_start AND e.ts <= i.w_end
GROUP BY i.interval_id, i.user_id
""",
    doc="keyed range join: per-user 10-min windows after a hot error; "
    "equi-join on user + range filter — Catalyst hash-joins the key, the "
    "range predicate only sees same-user candidates",
)
def range_user_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    intervals = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 45))
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("user_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
        )
    )
    facts = ev.select("user_id", "ts", "value")
    joined = keyed_range_join(
        facts, intervals, key=["user_id"], fact_ts="ts", start="w_start", end="w_end"
    ).drop(intervals["user_id"])
    return joined.groupBy("interval_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@register(
    "range_global_incidents",
    """
WITH incidents AS (
    SELECT event_id AS incident_id, ts - INTERVAL 5 MINUTE AS w_start,
           ts + INTERVAL 5 MINUTE AS w_end
    FROM events WHERE event_type = 'error' AND value > 58
)
SELECT i.incident_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM incidents i
JOIN events e ON e.ts >= i.w_start AND e.ts <= i.w_end
GROUP BY i.incident_id
""",
    doc="keyless range join via coarse bucket explode (bucketed_range_join): "
    "each interval fans to its ~3 ten-minute buckets, facts map to one — an "
    "equi-join instead of the O(n·m) nested loop a theta join would plan",
)
def range_global_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    incidents = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 58))
        .select(
            F.col("event_id").alias("incident_id"),
            (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
        )
    )
    facts = ev.select(F.col("ts"), F.col("user_id"))
    joined = bucketed_range_join(
        facts, incidents, fact_ts="ts", start="w_start", end="w_end", bucket_seconds=600
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "events_gapfill_locf",
    """
WITH ranked AS (
    SELECT user_id, date_trunc('day', ts) AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), daily AS (
    SELECT user_id, bucket,
           max(CASE WHEN rn = 1 THEN value END) AS obs_value,
           COUNT(*)::BIGINT AS n_obs
    FROM ranked GROUP BY 1, 2
), bounds AS (
    SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM daily GROUP BY 1
), grid AS (
    SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket
    FROM bounds
), filled AS (
    SELECT g.user_id, g.bucket, d.obs_value, d.n_obs,
           ROW_NUMBER() OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS rn
    FROM grid g LEFT JOIN daily d USING (user_id, bucket)
)
SELECT user_id,
       strftime(bucket, '%Y-%m-%d') AS day,
       COALESCE(n_obs, 0)::BIGINT AS n_events,
       n_obs IS NOT NULL AS is_observed,
       last_value(obs_value IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
       CAST(rn - last_value(CASE WHEN n_obs IS NOT NULL THEN rn END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS gap_age
FROM filled
""",
    doc="time-grid gap-fill + LOCF (operators/gapfill.py): each user's "
    "irregular event stream resampled onto its dense daily calendar spine "
    "between first and last observed day; the bucket value is the LAST "
    "event's (max (ts, event_id) — deterministic under duplicate "
    "timestamps), carried forward across unobserved days with the carry "
    "age reported as a grid-rank difference (grain-agnostic, no timestamp "
    "arithmetic). Plan: one map-side-combined fact shuffle to (user, day), "
    "key-cardinality bounds, shuffle-free sequence+explode grid, per-key "
    "LOCF window — the skew dial for very-long-lived keys is chunked LOCF "
    "(per-chunk close + chunk-cardinality carry window), the volume dial "
    "is the grain",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aci_export_spark.operators.gapfill import gapfill_locf

    ev = read_table(spark, sf_dir, "events")
    out = gapfill_locf(
        ev, key=["user_id"], ts_col="ts", value_col="value",
        tie_col="event_id", grain="DAY",
    )
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "n_events",
        "is_observed",
        "value_locf",
        "gap_age",
    )
