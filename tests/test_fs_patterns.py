"""fs_agreement_patterns (operators/fuzzy.py): hand-computed pattern
counts on a tiny frame; blocking actually restricts the pair space."""

from __future__ import annotations

import pyspark.sql.functions as F

from aci_export_spark.operators.fuzzy import fs_agreement_patterns


def test_hand_computed_patterns(spark):
    rows = [
        # block (1, 'A'): three records -> 3 pairs
        (1, "anna", 1, "A"),
        (2, "anne", 1, "A"),   # lev(anna, anne)=1 -> fuzzy agree with 1
        (3, "zorro", 1, "A"),
        # block (2, 'A'): one record -> no pairs
        (4, "anna", 2, "A"),
        # different segment, same nation as block 1 -> no cross pairs
        (5, "anna", 1, "B"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "segment"])
    got = {
        (r["g_name"],): r["n_pairs"]
        for r in fs_agreement_patterns(
            df,
            id_col="id",
            block_cols=["nation", "segment"],
            agree_exprs={"g_name": F.levenshtein(F.col("a_name"), F.col("b_name")) <= 1},
        ).collect()
    }
    # pairs: (1,2) agree; (1,3), (2,3) disagree
    assert got == {(True,): 1, (False,): 2}


def test_pair_space_is_blocked_and_ordered(spark):
    rows = [(i, f"n{i}", i % 2, "S") for i in range(6)]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "segment"])
    out = fs_agreement_patterns(
        df,
        id_col="id",
        block_cols=["nation"],
        agree_exprs={"g_always": F.lit(True)},
    ).collect()
    # two blocks of 3 -> 3 pairs each = 6 total, never the unblocked 15
    assert sum(r["n_pairs"] for r in out) == 6


# ---------------------------------------------------------------------------
# fs_em_fixed_point / fs_em_weights
# ---------------------------------------------------------------------------

def test_em_recovers_planted_parameters():
    """Generate pattern frequencies from KNOWN (lambda, m, u) — the exact
    expected counts of the two-class model — and check EM lands near the
    planted values. THREE conditionally-independent comparators: the
    classic identifiability minimum (2^K - 1 cells must cover the 2K + 1
    parameters; K=2 is underdetermined and EM drifts along the ridge)."""
    from fractions import Fraction
    from itertools import product

    from aci_export_spark.operators.fuzzy import fs_em_fixed_point

    lam, m, u = 0.2, (0.95, 0.8, 0.7), (0.05, 0.3, 0.2)
    n_total = 1_000_000
    patterns = []
    for gamma in product((False, True), repeat=3):
        pm = lam
        pu = 1 - lam
        for k, g in enumerate(gamma):
            pm *= m[k] if g else 1 - m[k]
            pu *= u[k] if g else 1 - u[k]
        patterns.append((gamma, round(n_total * (pm + pu))))
    got_lam, got_m, got_u = fs_em_fixed_point(patterns, 3, iters=200)
    assert abs(float(got_lam) - lam) < 0.01
    for k in range(3):
        assert abs(float(got_m[k]) - m[k]) < 0.02
        assert abs(float(got_u[k]) - u[k]) < 0.02
    # every parameter sits on the 2^-40 grid (exactness contract)
    for p in (got_lam, *got_m, *got_u):
        assert (1 << 40) % Fraction(p).denominator == 0


def test_em_pattern_table_is_sufficient():
    """EM on (pattern, count) equals EM on the exploded pair list — the
    table really is the sufficient statistic (count-weighting is exact)."""
    from aci_export_spark.operators.fuzzy import fs_em_fixed_point

    patterns = [((False, False), 40), ((True, False), 7),
                ((False, True), 12), ((True, True), 5)]
    exploded = [(g, 1) for g, n in patterns for _ in range(n)]
    assert fs_em_fixed_point(patterns, 2, iters=30) == fs_em_fixed_point(
        exploded, 2, iters=30
    )


def test_em_weights_query_shape(spark):
    """End-to-end on a tiny frame: one row per comparator, lambda constant
    across rows, weights consistent with m/u, all probabilities in (0,1)."""
    from aci_export_spark.operators.fuzzy import fs_em_weights

    rows = [
        (1, "anna", 1, "A"), (2, "anne", 1, "A"), (3, "zorro", 1, "A"),
        (4, "berta", 1, "A"), (5, "bertha", 1, "A"), (6, "carl", 1, "A"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "segment"])
    out = fs_em_weights(
        df,
        id_col="id",
        block_cols=["nation", "segment"],
        agree_exprs={
            "g_lev1": F.levenshtein(F.col("a_name"), F.col("b_name")) <= 1,
            "g_len": F.length("a_name") == F.length("b_name"),
        },
    ).collect()
    assert [r["field"] for r in out] == ["g_lev1", "g_len"]
    assert len({r["lambda_match"] for r in out}) == 1
    for r in out:
        assert 0.0 < r["m"] < 1.0 and 0.0 < r["u"] < 1.0
        assert r["agree_weight"] == r["m"] / r["u"]
        assert r["disagree_weight"] == (1.0 - r["m"]) / (1.0 - r["u"])


def test_em_empty_pattern_table_raises():
    import pytest as _pytest

    from aci_export_spark.operators.fuzzy import fs_em_fixed_point

    with _pytest.raises(ValueError, match="empty agreement-pattern table"):
        fs_em_fixed_point([], 3)


def test_em_field_cap_raises(spark):
    """FS_MAX_FIELDS loud guard (r11): a comparison vector wider than the
    cap must raise BEFORE any distributed work — 2^K patterns would no
    longer be a driver-bounded collect."""
    import pytest as _pytest

    from aci_export_spark.operators.fuzzy import FS_MAX_FIELDS, fs_em_weights

    df = spark.createDataFrame([(1, "a", 1)], ["id", "name", "nation"])
    too_wide = {
        f"g{i}": F.length("a_name") == F.length("b_name")
        for i in range(FS_MAX_FIELDS + 1)
    }
    with _pytest.raises(ValueError, match="FS_MAX_FIELDS"):
        fs_em_weights(df, id_col="id", block_cols=["nation"],
                      agree_exprs=too_wide)
