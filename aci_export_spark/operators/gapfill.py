"""Time-grid gap-fill with last-observation-carried-forward (LOCF).

The missing half of the temporal-join family (`operators/asof.py`,
`operators/range_join.py`): resampling an irregular event stream onto a
regular per-key time grid so downstream windows/joins see one row per
(key, bucket) — the standard warehouse "calendar spine" pattern, and what
`ASOF JOIN` against a generated grid computes in engines that ship one
(DuckDB, QuestDB). Extends the reference's interval logic
(`ddb/src/leadership.rs:95-122`) from validity windows to dense series.

Semantics per key:

- bucket observations to `date_trunc(grain)`; the bucket's observed value
  is the LAST event's (max ``(ts, tie)`` — deterministic under duplicate
  timestamps because the tie column is unique);
- generate the dense bucket grid from the key's first to last OBSERVED
  bucket (no key ever leads with a NULL carry);
- carry the last observed value forward across unobserved buckets, and
  report the carry age (`gap_age` buckets since the source observation).

Scale shape (100 TB): the bucketing aggregate is the only fact-table
shuffle (map-side combined, keyed by (key, bucket)); bounds reduce
key-cardinality rows; the grid explode is linear in emitted grid rows and
never shuffles (`sequence` + `explode` over the bounds table); the LOCF
window partitions BY KEY — embarrassingly parallel across keys, state is
one running value per partition chain. The skew dial is a very-long-lived
key (grid rows = its bucket span): split such keys into fixed bucket
chunks, LOCF within chunks, then carry the per-chunk closing value across
chunks with a second (chunk-cardinality) cumulative window — two linear
passes, no single-task window. The grain itself is the volume dial: the
grid is bounded by key_cardinality x span/grain, independent of event
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    key: list[str],
    ts_col: str,
    value_col: str,
    tie_col: str,
    grain: str = "DAY",
) -> DataFrame:
    """Resample `df` onto a dense per-key `grain` grid, carrying the last
    observed `value_col` forward. Returns one row per (key, bucket) with:

    - ``bucket`` (timestamp, truncated to `grain`)
    - ``n_events`` — observations in the bucket (0 on filled rows)
    - ``is_observed`` — whether the bucket had any observation
    - ``value_locf`` — last-in-bucket value, carried forward across gaps
    - ``gap_age`` — buckets since the observation the value came from
      (0 on observed rows); grain-agnostic, counted on the grid itself
    """
    per_bucket = (
        df.select(
            *key,
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
            F.col(ts_col).alias("__ts"),
            F.col(tie_col).alias("__tie"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*key, "bucket")
        .agg(
            # deterministic "last in bucket": argmax over the (ts, tie)
            # struct — tie column unique, so duplicate timestamps can't
            # make the bucket value depend on partitioning
            F.max_by("__v", F.struct("__ts", "__tie")).alias("obs_value"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )
    bounds = per_bucket.groupBy(*key).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    step = F.expr(f"interval 1 {grain.lower()}")
    grid = bounds.select(
        *key, F.explode(F.sequence("__b0", "__b1", step)).alias("bucket")
    )
    filled = grid.join(per_bucket, on=[*key, "bucket"], how="left")
    w = (
        Window.partitionBy(*key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # row_number is monotone along the grid, so "buckets since the carried
    # observation" is a rank difference — no timestamp arithmetic, which
    # keeps gap_age correct for any grain (months aren't fixed-width)
    rn = F.row_number().over(Window.partitionBy(*key).orderBy("bucket"))
    observed = F.col("n_obs").isNotNull()
    out = (
        filled.withColumn("__rn", rn)
        .withColumn("is_observed", observed)
        .withColumn("value_locf", F.last("obs_value", ignorenulls=True).over(w))
        .withColumn(
            "gap_age",
            F.col("__rn")
            - F.last(F.when(observed, rn), ignorenulls=True).over(w),
        )
    )
    return out.select(
        *key,
        "bucket",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_events"),
        "is_observed",
        "value_locf",
        F.col("gap_age").cast("int").alias("gap_age"),
    )
