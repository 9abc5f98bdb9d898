"""EXACT distributed quantiles without a global sort: iterative range
bisection (the classic "histogram refinement" / BlinkDB-era k-th-statistic
scheme — Munro & Paterson's multi-pass selection, Theor. Comp. Sci. 1980,
is the canonical analysis).

``approx_percentile`` trades exactness for one pass; ``ORDER BY`` buys
exactness with a full sort (one all-to-one stage at the percentile
boundary).  This operator gets EXACT order statistics in a handful of
COUNTING passes instead: each round histograms the surviving value range
into equal-width buckets (one map-side-combined aggregate whose result is
≤ quantiles·fan-out rows), locates the bucket containing the target rank,
and recurses into it.  The fan-out is ADAPTIVE (r13, guide §1.2 — each
round is a full counting job, so fewer rounds is the lever): isqrt of the
widest surviving range targets two remaining rounds, capped at
``MAX_BRANCH`` = 65536, so an int64 domain resolves in ≤ 4 rounds and
real value domains (prices in cents, millisecond timestamps) in 2, each
a corpus-linear scan with the range filter PUSHED DOWN to the parquet
scan (later rounds touch a vanishing fraction of row groups under any
clustered layout).

Driver state is bounded by quantiles · branch counts per round (the
pagerank_fixed_point bounded-collect discipline) — never a row collect.

Float discipline: ranks are exact integers (k = ceil(p·n) on a ppm grid,
the repo's LOWER-quantile convention: rank (n+1) div 2 at p=0.5); values
never leave int64.

Reference parity note: the reference engine (madninja/aci-export) has no
quantile surface; this extends the beyond-reference analytics operators.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: histogram fan-out FLOOR per round; the adaptive rule below widens it up
#: to MAX_BRANCH so real value domains resolve in as few counting passes as
#: possible (each pass is one full job — at bench scale the job barrier IS
#: the cost, guide §1.2: fewer passes over the data)
BRANCH = 1024
#: fan-out ceiling: bounds the driver collect at quantiles · MAX_BRANCH
#: counting rows per round (≤ 256k rows / a few MB at 4 quantiles — still
#: the pagerank bounded-collect discipline, never a row collect)
MAX_BRANCH = 65536
#: hard stop — provably unreachable: the adaptive fan-out is ≥ 1024, so an
#: int64 domain resolves in ≤ 4 rounds (2^64 → 2^48 → 2^32 → 2^16 → done)
MAX_ROUNDS = 16


def _adaptive_branch(max_range: int, floor: int) -> int:
    """Per-round fan-out: finish NOW when the widest surviving range fits
    under MAX_BRANCH buckets of width 1; otherwise aim for two remaining
    rounds (isqrt splits the log-range evenly — round 1 leaves a range its
    own round-2 fan-out covers exactly), capped at MAX_BRANCH so the
    bounded-collect contract holds on a full int64 domain.

    Equal-width bucketing is EXACT at any fan-out (the bucket containing
    the target rank is located from exact integer counts), so the fan-out
    choice changes job count only, never the result.

    A caller-narrowed ``floor`` below the BRANCH default is honored
    verbatim (tests force multi-round refinement with branch=4)."""
    if floor < BRANCH:
        return floor
    if max_range < MAX_BRANCH:
        return max_range + 1
    return max(floor, min(MAX_BRANCH, math.isqrt(max_range) + 1))


def exact_quantiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    probs_ppm: list[int],
    branch: int = BRANCH,
) -> DataFrame:
    """Exact lower quantiles of an integral column, one row per requested
    probability: (prob_ppm, n, k, value) with value = the k-th smallest,
    k = ceil(prob · n) computed exactly on the ppm grid.

    NULLs are excluded (the SQL aggregate convention); an empty input
    raises loudly rather than emitting a fabricated quantile.
    """
    vals = df.select(F.col(value_col).cast("long").alias("v")).filter(
        F.col("v").isNotNull()
    )
    head = vals.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        raise ValueError("exact_quantiles: empty input (after NULL filter)")
    glo, ghi = int(head["lo"]), int(head["hi"])
    # k = ceil(p*n / 1e6) with pure integer arithmetic; p=500000, n even
    # gives n/2 — the repo's exact-LOWER-median convention
    states = {
        qi: {
            "prob": p,
            "k": max(1, (p * n + 999_999) // 1_000_000),
            "lo": glo,
            "hi": ghi,
            "below": 0,
            "value": None,
        }
        for qi, p in enumerate(probs_ppm)
    }

    # Overflow guard (r10 advice): the Spark-side bucket expression computes
    # ``v - lo`` in int64, which WRAPS silently in non-ANSI mode when the
    # global range spans more than the int64 domain (lo deeply negative, v
    # large positive). Python's bigints detect that exactly; one extra
    # counting pass splits the first bisection at 0 so every surviving
    # per-quantile range — and therefore every later ``v - lo`` — fits.
    if ghi - glo >= 2**63:
        n_neg = vals.filter(F.col("v") < 0).count()
        for s in states.values():
            if s["k"] <= n_neg:
                s["hi"] = -1
            else:
                s["below"] = n_neg
                s["lo"] = 0

    rounds = 0
    while any(s["value"] is None for s in states.values()):
        rounds += 1
        if rounds > MAX_ROUNDS:  # pragma: no cover — see module docstring
            raise RuntimeError("exact_quantiles: bisection failed to converge")
        live = {qi: s for qi, s in states.items() if s["value"] is None}
        # trivial resolution: a collapsed range needs no scan
        for s in live.values():
            if s["lo"] == s["hi"]:
                s["value"] = s["lo"]
        live = {qi: s for qi, s in live.items() if s["value"] is None}
        if not live:
            break
        branch_eff = _adaptive_branch(
            max(s["hi"] - s["lo"] for s in live.values()), branch
        )
        widths = {
            qi: (s["hi"] - s["lo"]) // branch_eff + 1 for qi, s in live.items()
        }
        arms = F.array(
            *[
                F.when(
                    F.col("v").between(F.lit(s["lo"]), F.lit(s["hi"])),
                    F.struct(
                        F.lit(qi).alias("qi"),
                        # integral div — a double quotient would lose
                        # exactness past 2^53 on a full int64 domain
                        F.expr(
                            f"(v - {s['lo']}L) div {widths[qi]}L"
                        ).alias("bucket"),
                    ),
                )
                for qi, s in live.items()
            ]
        )
        range_filter = None
        for s in live.values():
            c = F.col("v").between(F.lit(s["lo"]), F.lit(s["hi"]))
            range_filter = c if range_filter is None else (range_filter | c)
        counts = (
            vals.filter(range_filter)
            .select(
                F.explode(F.filter(arms, lambda x: x.isNotNull())).alias("a")
            )
            .groupBy(F.col("a.qi").alias("qi"), F.col("a.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()  # bounded: ≤ len(live) · branch rows
        )
        by_q: dict[int, list[tuple[int, int]]] = {qi: [] for qi in live}
        for r in counts:
            by_q[int(r["qi"])].append((int(r["bucket"]), int(r["c"])))
        for qi, s in live.items():
            cum = s["below"]
            target = None
            for bucket, c in sorted(by_q[qi]):
                if cum + c >= s["k"]:
                    target = bucket
                    break
                cum += c
            if target is None:  # pragma: no cover — rank beyond range
                raise RuntimeError("exact_quantiles: rank not covered")
            w = widths[qi]
            s["below"] = cum
            s["lo"] = s["lo"] + target * w
            s["hi"] = min(s["hi"], s["lo"] + w - 1)
            if s["lo"] == s["hi"]:
                s["value"] = s["lo"]

    rows = [
        (s["prob"], n, s["k"], s["value"]) for s in states.values()
    ]
    from aci_export_spark.localrows import local_rows_df

    return local_rows_df(
        spark, rows, schema="prob_ppm long, n long, k long, value long"
    )
