"""Exact bisection quantiles (operators/quantiles.py): differential vs a
sorted-oracle over adversarial distributions (duplicates, skew, negatives,
two-point), the rank convention, and the loud empty-input contract."""

from __future__ import annotations

import pytest

from aci_export_spark.operators.quantiles import exact_quantiles

PROBS = [1, 250_000, 500_000, 900_000, 999_999, 1_000_000]


def _sorted_oracle(vals, probs_ppm):
    s = sorted(vals)
    n = len(s)
    out = {}
    for p in probs_ppm:
        k = max(1, (p * n + 999_999) // 1_000_000)
        out[p] = (n, k, s[k - 1])
    return out


def _check(spark, vals, probs=PROBS):
    df = spark.createDataFrame([(v,) for v in vals], schema="v long")
    got = {
        r["prob_ppm"]: (r["n"], r["k"], r["value"])
        for r in exact_quantiles(spark, df, "v", probs).collect()
    }
    assert got == _sorted_oracle(vals, probs)


def test_quantiles_duplicates_heavy(spark):
    # 90% of mass on one value — the bucket walk must handle a single
    # bucket absorbing most ranks
    vals = [7] * 900 + list(range(100))
    _check(spark, vals)


def test_quantiles_negatives_and_wide_range(spark):
    vals = [-(10**12), -5, -5, 0, 3, 3, 10**12, 42, -999999999, 77]
    _check(spark, vals)


def test_quantiles_full_int64_span_no_wrap(spark):
    """Range spanning more than the int64 domain (r10 advice): ``v - lo``
    would wrap in non-ANSI mode without the sign pre-split — these values
    straddle INT64_MIN..INT64_MAX and must still resolve exactly."""
    lo, hi = -(2**63), 2**63 - 1
    vals = [lo, lo + 1, -7, -1, 0, 1, 12345, hi - 1, hi, hi, 3, -(2**62)]
    _check(spark, vals)


def test_quantiles_two_point_and_single(spark):
    _check(spark, [1, 2])
    _check(spark, [5])
    _check(spark, [5, 5, 5, 5])


def test_quantiles_dense_sequential(spark):
    _check(spark, list(range(1, 1001)))


def test_quantiles_adversarial_bucket_edges(spark):
    # values straddling bucket boundaries at branch=4 force multi-round
    # refinement with non-zero 'below' carry
    vals = [0, 1, 2, 3, 4, 5, 6, 7, 1000, 1001, 1002, 2000]
    df = spark.createDataFrame([(v,) for v in vals], schema="v long")
    got = {
        r["prob_ppm"]: (r["n"], r["k"], r["value"])
        for r in exact_quantiles(spark, df, "v", PROBS, branch=4).collect()
    }
    assert got == _sorted_oracle(vals, PROBS)


def test_adaptive_branch_round_counts():
    """The r13 adaptive fan-out: simulate the per-round range shrink and
    assert the round-count contract — int64 domain <= 4 rounds, a
    price-in-cents-sized domain (6e7) exactly 2, a sub-65536 domain 1 —
    and that an explicitly narrowed branch (tests) is honored verbatim."""
    from aci_export_spark.operators.quantiles import (
        BRANCH,
        MAX_BRANCH,
        _adaptive_branch,
    )

    def rounds(rng: int) -> int:
        n = 0
        while rng > 0:
            b = _adaptive_branch(rng, BRANCH)
            assert b <= MAX_BRANCH
            # width = rng // b + 1; surviving range = width - 1 = rng // b
            rng = rng // b
            n += 1
            if n > 16:
                raise AssertionError("did not converge")
        return n

    assert rounds(2**64 - 1) <= 4
    assert rounds(60_000_000) == 2
    assert rounds(50_000) == 1
    assert _adaptive_branch(2000, 4) == 4  # caller-narrowed: verbatim


def test_quantiles_adaptive_differential_midrange(spark):
    # range just above MAX_BRANCH exercises the isqrt path end-to-end
    vals = [0, 1, 65535, 65536, 65537, 131072, 99999, 70000, 3, 65538]
    _check(spark, vals)


def test_quantiles_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (2,)], schema="v long"
    )
    got = {
        r["prob_ppm"]: (r["n"], r["k"], r["value"])
        for r in exact_quantiles(spark, df, "v", [500_000]).collect()
    }
    assert got == {500_000: (3, 2, 2)}


def test_quantiles_empty_raises(spark):
    df = spark.createDataFrame([], schema="v long")
    with pytest.raises(ValueError, match="empty input"):
        exact_quantiles(spark, df, "v", [500_000])


def test_quantiles_median_convention(spark):
    # even n: k = ceil(0.5n) = n/2 — the repo's exact LOWER median
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], schema="v long")
    r = exact_quantiles(spark, df, "v", [500_000]).collect()[0]
    assert (r["k"], r["value"]) == (2, 2)
