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


# ---------------------------------------------------------------------------
# HyperLogLog: the distinct-count sketch (Flajolet et al. AofA'07) that
# replaces COUNT(DISTINCT)'s full-key shuffle with a fixed 2^p-register
# state — the "HLL dial" the exact operators in this repo document for
# 100 TB. Same portability discipline as count-min: registers derive from
# md5 (hash64), so DuckDB rebuilds the identical sketch, and every emitted
# quantity is an integer (the 2^-M harmonic sum is scaled by 2^(wbits+1)
# so even the w=0 / absent-register terms stay integral).
# ---------------------------------------------------------------------------

#: register-index bits: m = 2^HLL_P registers per group
HLL_P = 9
#: rank-domain bits left in the 60-bit hash after the register index
HLL_WBITS = 60 - HLL_P
#: alpha_m for m = 512 on a ppm grid: floor(1e6 * 0.7213 / (1 + 1.079/512))
HLL_ALPHA_PPM = 719_783


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    salt: str = "hll:",
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., register, max_rho).

    register = top HLL_P bits of hash64(key); rho = leading-zero count of
    the remaining HLL_WBITS bits + 1 (w = 0 → HLL_WBITS + 1), computed
    exactly as ``wbits - bit_length(w) + 1`` with bit_length = length of
    the no-leading-zeros binary string (identical in Spark and DuckDB).

    The groupBy is map-side combined: every task reduces to ≤ groups·2^p
    partial rows before the shuffle — the entire point of the sketch at
    100 TB. Registers MERGE by max: the union of two corpora's register
    tables groupBy-max'ed equals the union corpus's registers (tested),
    so partitions/days/streams sketch independently and fold."""
    h = hash64(F.col(key_col).cast("string"), salt)
    w = h % (1 << HLL_WBITS)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, HLL_WBITS).cast("long").alias("register"),
            rho.cast("long").alias("__rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("__rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table to per-group estimates, all-integer:

    - ``n_registers``  — occupied registers (≤ 2^p)
    - ``z_scaled``     — Σ_j 2^(wbits+1−M_j) over ALL 2^p registers
      (absent registers contribute the full 2^(wbits+1) term); fits
      BIGINT: 2^p · 2^(wbits+1) = 2^61
    - ``hll_estimate`` — floor(alpha_ppm · m² · 2^(wbits+1) /
      (z_scaled · 1e6)), the raw HLL estimate with alpha on a ppm grid;
      the product runs in DECIMAL(38,0) with integral division (both
      engines floor exactly — no decimal-scale rounding in the quotient)

    The small-range (linear-counting) and large-range corrections are
    caller-side policy — this audit-grade fold emits the raw estimator
    plus the zero-register count the corrections need."""
    m = 1 << HLL_P
    # 2^(wbits+1-M) via shift — never float pow (the SQL form takes a
    # column shift amount; the Python wrapper only accepts a literal)
    term = F.expr(f"shiftleft(1L, {HLL_WBITS + 1} - cast(max_rho as int))")
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(term).cast("long").alias("__z_occupied"),
    )
    z = (
        F.col("__z_occupied")
        + (F.lit(m) - F.col("n_registers")) * F.lit(1 << (HLL_WBITS + 1))
    ).cast("long")
    # alpha_ppm · m² · 2^(wbits+1) as an exact decimal literal (too big for
    # BIGINT); the quotient is the ppm-descaled estimate and fits long
    num_lit = HLL_ALPHA_PPM * m * m * (1 << (HLL_WBITS + 1))
    est = F.expr(
        f"cast({num_lit}bd div (cast(z_scaled as decimal(38,0)) * 1000000) "
        "as long)"
    )
    return per.select(
        *group_cols,
        "n_registers",
        z.alias("z_scaled"),
    ).select(*group_cols, "n_registers", "z_scaled", est.alias("hll_estimate"))
