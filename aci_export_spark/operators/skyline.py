"""Pareto-frontier (skyline) operator: rows not dominated in two maximized
dimensions.

Row r is dominated iff some row r' has x' ≥ x AND y' ≥ y with at least one
strict inequality.  The naive formulation is an O(n²) NOT EXISTS self-join;
the sort-based plan here is one aggregation plus one window pass:

  1. collapse to per-x groups with gmax = MAX(y) per x    (one shuffle on x,
     partial map-side max — the grouped table is x-cardinality-sized);
  2. over groups ordered by x DESC, prevmax = running MAX(gmax) over
     STRICTLY greater x (rowsBetween(unboundedPreceding, -1) on the
     grouped table, where every row is a distinct x);
  3. a row survives iff y = gmax(x)  (nothing at the same x beats it —
     an equal-x row with larger y dominates strictly in y)
     and (prevmax IS NULL OR y > prevmax)  (nothing at strictly larger x
     ties-or-beats it — a larger-x row with equal y dominates strictly
     in x).  Duplicate (x, y) rows never dominate each other (no strict
     part), so whole duplicate groups survive together — the standard
     skyline semantics.

With `partition_by`, both the aggregate and the window carry the partition
key, so each partition's frontier computes independently — the 100 TB
shape: the only global-ordering step becomes per-partition, and the window
input is |distinct x| per partition, not |rows|.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    x: str,
    y: str,
    partition_by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Rows of `df` on the maximization frontier of (x, y), per partition."""
    part = list(partition_by or [])
    gmax = df.groupBy(*part, x).agg(F.max(y).alias("__gmax"))
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_x = gmax.withColumn("__prevmax", F.max("__gmax").over(w)).filter(
        F.col("__prevmax").isNull() | (F.col("__gmax") > F.col("__prevmax"))
    )
    joined = df.join(frontier_x, on=part + [x], how="inner").filter(
        F.col(y) == F.col("__gmax")
    )
    return joined.drop("__gmax", "__prevmax")
