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

Boundary absorption: the match predicate is the double-evaluated
|a−b| ≤ ε (same expression the oracle engines run), and IEEE rounding can
ABSORB a sub-ulp excess at the boundary — a pair whose real difference is
ε + δ (δ below half an ulp of ε) rounds down to exactly ε and matches,
yet its buckets sit TWO apart (e.g. a = 1.9, b = −1e−308, ε = 1.9:
buckets 1 and −1). The ±1 probe alone would drop it. Such pairs can only
involve a left row whose quotient a/ε lies within an ulp of a bucket
edge, so those edge rows (fractional part < 2⁻²⁰ or > 1 − 2⁻²⁰) probe
one extra bucket on that side. Candidate volume stays ~3·n — real-valued
data puts a ~2⁻²⁰ sliver of rows on an edge; adversarially edge-heavy
data degrades to 4·n, still linear.

Domain bound for exact recall: the probe assumes the division v/ε is
accurate enough that a predicate-true pair lands at most one bucket apart
(two for edge rows). That holds while the quotient |v|/ε stays well
inside double precision (≲ 2⁵¹); as it approaches 2⁵² the division's
half-ulp rounding can itself exceed 1 bucket and silently drop a boundary
pair. Callers in that regime should quantize exactly instead — when
inputs are decimals (e.g. cent-valued prices, as in
`parts_price_band_pairs`), scale to integers and bucket with integer
division, which has no rounding at any magnitude.
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
    edge_tol = 2.0 ** -20
    q = F.col(left_val) / F.lit(eps)
    lb = left.withColumn("__bucket", F.floor(q)).withColumn(
        "__frac", q - F.floor(q)
    )
    rb = right.withColumn("__rbucket", F.floor(F.col(right_val) / F.lit(eps)))
    b = F.col("__bucket")
    empty = F.array().cast("array<bigint>")
    probe_arr = F.concat(
        F.when(F.col("__frac") < F.lit(edge_tol), F.array(b - 2)).otherwise(empty),
        F.array(b - 1, b, b + 1),
        F.when(F.col("__frac") > F.lit(1.0 - edge_tol), F.array(b + 2)).otherwise(
            empty
        ),
    )
    probe = lb.withColumn("__probe", F.explode(probe_arr)).drop("__frac")
    joined = probe.join(rb, probe["__probe"] == rb["__rbucket"])
    band = F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(eps)
    if how_filter is not None:
        band = band & how_filter
    return joined.filter(band).drop("__bucket", "__probe", "__rbucket")
