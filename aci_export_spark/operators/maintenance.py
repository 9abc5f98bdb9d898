"""Table-maintenance planning: small-file compaction (the OPTIMIZE /
bin-packing planner) computed as a declarative plan over a file catalog.

At 100 TB the dominant operational failure of a parquet lake is the
small-file problem: a partition with 50,000 x 2 MB files pays 50,000 open/
footer-read round trips per scan.  Every table format's fix (Delta
OPTIMIZE, Iceberg rewrite_data_files, Hudi clustering) is the same planning
step: group neighboring small files into target-size output groups, one
rewrite task per group.  The PLAN is cheap metadata work — catalog-sized,
never data-sized — and exactly expressible as a window cumsum: files
ordered within a partition, output group = floor(running-bytes-before /
target).  This is the ordered variant of first-fit-decreasing that
preserves sort/cluster order (required when the table is z-ordered:
events_zorder_keys composes with this planner).

All arithmetic is integer (cumulative byte sums, one floor division), so
the plan is bit-identical across engines.  Scale: the catalog for a 100 TB
table is ~10^6 rows — the per-partition window cumsum is metadata-scale;
partition-key parallelism bounds the single-task risk, and a catalog too
big for one task per partition shards by (partition, bucket-of-key) with
per-shard offsets (the hierarchical-cumsum dial documented by
llm_weighted_sample).

Reference parity note: the reference engine (madninja/aci-export) mirrors
rows into MySQL/Postgres and has no lake-maintenance surface; this extends
the beyond-reference operational toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    catalog: DataFrame,
    partition_col: str,
    file_key_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign every catalog row (one file) to an output compaction group:
    within each table partition, files in `file_key_col` order pack into
    groups of ~`target_bytes` (group = bytes-before div target — a file
    straddling a boundary joins the group it STARTED in, so groups can
    exceed the target by at most one file; a single file larger than the
    target gets its own group).  Returns one row per output group:

    (partition, group_id, n_files, group_bytes, min_key, max_key,
     oversized — whether the group exceeds the target)
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = catalog.select(
        F.col(partition_col),
        F.col(file_key_col),
        F.col(size_col).cast("long").alias("__bytes"),
        F.coalesce(
            F.sum(F.col(size_col).cast("long")).over(w), F.lit(0).cast("long")
        ).alias("__cum_before"),
    ).withColumn(
        "group_id", F.expr(f"__cum_before div {int(target_bytes)}L")
    )
    return (
        assigned.groupBy(partition_col, "group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("__bytes").alias("group_bytes"),
            F.min(file_key_col).alias("min_key"),
            F.max(file_key_col).alias("max_key"),
        )
        .select(
            partition_col,
            "group_id",
            "n_files",
            "group_bytes",
            "min_key",
            "max_key",
            (F.col("group_bytes") > F.lit(int(target_bytes))).alias("oversized"),
        )
    )
