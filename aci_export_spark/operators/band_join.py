"""Epsilon band join: pair rows whose numeric values differ by at most ε,
without a cross product.

The naive |a.v − b.v| ≤ ε predicate forces a nested-loop (Spark falls back
to BroadcastNestedLoopJoin / cartesian).  The scalable plan quantizes both
sides to ε-width buckets and equi-joins each left bucket to its right
bucket and the two neighbors: any pair within ε lands in the same or an
adjacent bucket, so the equi-join is a superset (guaranteed recall) and
the exact |Δ| ≤ ε filter runs only on bucket-local candidates.  Shuffle
volume is O(3·n) rows keyed by bucket — never O(n²); bucket skew follows
value skew and is handled by the same AQE skew-split as any hot join key.

Buckets are computed with floor(v/ε) on doubles — floor is exact on IEEE
doubles and replayable in any engine, so the candidate set itself is
deterministic (the final filter makes correctness independent of edge
rounding anyway: a pair on a bucket boundary appears via the neighbor
key).

Domain bound for exact recall: the ±1 neighbor probe assumes the division
v/ε is accurate enough that a true |a−b| ≤ ε pair lands at most one bucket
apart. That holds while the quotient |v|/ε stays well inside double
precision (≲ 2⁵¹); as it approaches 2⁵² the division's half-ulp rounding
can itself exceed 1 bucket and silently drop a boundary pair. Callers in
that regime should quantize exactly instead — when inputs are decimals
(e.g. cent-valued prices, as in `parts_price_band_pairs`), scale to
integers and bucket with integer division, which has no rounding at any
magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
    how_filter=None,
) -> DataFrame:
    """All (left, right) pairs with |left_val − right_val| ≤ eps.

    Columns of both inputs are preserved (prefix-disambiguate before the
    call); `how_filter` optionally adds an extra pair predicate (e.g.
    key inequality for self-joins) applied WITH the band filter, before
    any downstream shuffle sees the pairs."""
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / F.lit(eps)))
    rb = right.withColumn("__rbucket", F.floor(F.col(right_val) / F.lit(eps)))
    probe = lb.withColumn(
        "__probe", F.explode(F.array(F.col("__bucket") - 1, F.col("__bucket"), F.col("__bucket") + 1))
    )
    joined = probe.join(rb, probe["__probe"] == rb["__rbucket"])
    band = F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(eps)
    if how_filter is not None:
        band = band & how_filter
    return joined.filter(band).drop("__bucket", "__probe", "__rbucket")
