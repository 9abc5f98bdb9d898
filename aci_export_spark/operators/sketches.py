"""Count-min sketch as a relational operator.

The frequency-estimation sketch behind streaming heavy-hitter systems: a
depth×width counter grid where every key increments one bucket per row via
independent hashes, and a key's estimate is the MIN over its buckets —
always an overestimate, with error bounded by collisions (ε ≈ e/width at
depth ln(1/δ)).

Like `llm/bloom.py`, the sketch IS a DataFrame — (i, bucket, cnt) rows,
bounded by depth·width regardless of input size — so it persists, unions
(cell-wise add), broadcasts, and is rebuildable by any engine from the same
md5-derived bucket function. Counter building is a groupBy with map-side
partial aggregation: each task reduces its input to ≤ depth·width partial
rows before the shuffle, which is the entire point of sketching at 100 TB
(the exact per-key aggregate shuffles every key; the sketch shuffles a
fixed-size grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.llm.hashing import hash64


def _bucket(key, i: int, width: int, salt: str):
    return hash64(key.cast("string"), f"{salt}{i}:") % width


def countmin_build(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build the counter grid: one (i, bucket, cnt) row per non-empty cell."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(F.col(key_col), i, width, salt).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__c")
    ).select("__c.i", "__c.bucket")
    return cells.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Estimate each key's frequency: probe its depth buckets (broadcast
    join against the bounded grid) and take the min. Keys absent from the
    stream estimate 0 via the left join's coalesce — a missing cell means
    nothing ever hashed there."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _bucket(F.col(key_col), i, width, salt).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__p"),
    ).select(F.col(key_col), F.col("__p.i").alias("i"), F.col("__p.bucket").alias("bucket"))
    return (
        probes.join(broadcast(counters), on=["i", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
