"""Fisher exact + BH: the integer recurrence vs the direct-comb reference
on random margins, the classic tea-tasting vector, and the BH grid rule
against a hand-computed example."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark.llm.fisher import (
    _fisher_p_ppb,
    fisher_reference_p_ppb,
)


def test_tea_tasting_vector() -> None:
    # Fisher's lady-tasting-tea 2x2: N=8, K=4, n=4, a=3.
    # masses over C(8,4)=70: [1, 16, 36, 16, 1]; obs=16 ->
    # p = (1+16+16+1)/70 = 34/70; ppb floor = 485714285
    assert _fisher_p_ppb(3, 4, 4, 8) == (34 * 10**9 * 10) // 700
    assert _fisher_p_ppb(3, 4, 4, 8) == 485714285


def test_extreme_table_is_significant() -> None:
    # a = K = n = 10 in N = 100: the most extreme table
    p = _fisher_p_ppb(10, 10, 10, 100)
    assert 0 <= p < 1000  # ~5.8e-14, floors to 0 on the ppb grid
    assert p == fisher_reference_p_ppb(10, 10, 10, 100)


def test_balanced_table_is_null() -> None:
    # perfectly proportional table: p = 1 (every mass <= obs max? no —
    # obs is the modal mass, so everything sums in)
    p = _fisher_p_ppb(25, 50, 50, 100)
    assert p == fisher_reference_p_ppb(25, 50, 50, 100)
    assert p > 900_000_000  # near 1


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_recurrence_matches_direct_comb(data) -> None:
    n_tot = data.draw(st.integers(2, 120))
    n1_ = data.draw(st.integers(1, n_tot))
    n_1 = data.draw(st.integers(1, n_tot))
    lo = max(0, n_1 - (n_tot - n1_))
    hi = min(n1_, n_1)
    n11 = data.draw(st.integers(lo, hi))
    assert _fisher_p_ppb(n11, n1_, n_1, n_tot) == fisher_reference_p_ppb(
        n11, n1_, n_1, n_tot
    )


def test_bh_grid_rule_hand_example() -> None:
    # p_ppb values for m=4 at q_ppb=5e7 (q=.05):
    # sorted [10_000_000, 20_000_000, 40_000_000, 900_000_000]
    # i=1: 1e7*4=4e7 <= 1*5e7 ok; i=2: 2e7*4=8e7 <= 1e8 ok;
    # i=3: 4e7*4=1.6e8 > 1.5e8 no; i=4: 9e8*4 > 2e8 no -> cutoff 2
    ps = [10_000_000, 20_000_000, 40_000_000, 900_000_000]
    m, q_ppb = len(ps), 50_000_000
    cutoff = 0
    for i, p in enumerate(ps, start=1):
        if p * m <= i * q_ppb:
            cutoff = i
    assert cutoff == 2


def test_corpus_cap_trips_loudly() -> None:
    from aci_export_spark.llm.fisher import fisher_bh_terms
    from aci_export_spark.session import get_spark

    spark = get_spark()
    df = spark.range(30).selectExpr(
        "id AS doc_id", "'a b c' AS text", "'s' AS source"
    )
    with pytest.raises(ValueError, match="FISHER_MAX_N"):
        fisher_bh_terms(df, max_n=10)


def test_mcnemar_hand_vector() -> None:
    from aci_export_spark.llm.fisher import mcnemar_exact_p_ppb

    # b=3, c=5: n=8, tail k<=3 = 1+8+28+56 = 93; p = 2*93/256
    assert mcnemar_exact_p_ppb(3, 5) == 726562500


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 60), st.integers(0, 60))
def test_mcnemar_recurrence_matches_comb(b: int, c: int) -> None:
    from aci_export_spark.llm.fisher import (
        mcnemar_exact_p_ppb,
        mcnemar_reference_p_ppb,
    )

    assert mcnemar_exact_p_ppb(b, c) == mcnemar_reference_p_ppb(b, c)
    assert mcnemar_exact_p_ppb(b, c) <= 1_000_000_000


def test_mcnemar_no_discordance_is_null_result() -> None:
    from aci_export_spark.llm.fisher import mcnemar_exact_p_ppb

    assert mcnemar_exact_p_ppb(0, 0) == 1_000_000_000
    assert mcnemar_exact_p_ppb(7, 7) == 1_000_000_000  # symmetric cap


def test_mcnemar_cap_trips_loudly() -> None:
    from aci_export_spark.llm.fisher import mcnemar_exact_p_ppb

    with pytest.raises(ValueError, match="MCNEMAR_MAX_DISC"):
        mcnemar_exact_p_ppb(20_000, 1)
