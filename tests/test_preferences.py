"""Bradley-Terry MM fit (operators/preferences.py): planted-strength
recovery, input-order invariance (the rational fixed-point trajectory must
not depend on pair enumeration), the win/game bookkeeping contract, and
loud failure on an unfit model."""

from __future__ import annotations

from fractions import Fraction

import pytest

from aci_export_spark.operators.preferences import (
    BT_SCALE,
    bt_fixed_point,
    bt_strengths,
)


def _planted_pairs():
    """Round-robin pair counts generated from planted strengths 4:2:1 by
    exact expected proportions (120 games per pair, wins = round of the BT
    win probability) — no RNG, fully deterministic."""
    strengths = {"a": 4, "b": 2, "c": 1}
    items = sorted(strengths)
    pairs = []
    for i, x in enumerate(items):
        for y in items[i + 1:]:
            n = 120
            p = Fraction(strengths[x], strengths[x] + strengths[y])
            wa = round(n * p)
            pairs.append((x, y, int(wa), n - int(wa)))
    return pairs


def test_recovers_planted_ordering_and_ratios():
    w = bt_fixed_point(_planted_pairs())
    assert w["a"] > w["b"] > w["c"]
    # planted ratio a:c = 4: recovered within 5% (120 games quantize wins)
    ratio = w["a"] / w["c"]
    assert Fraction(38, 10) < ratio < Fraction(42, 10)
    # strengths normalized: sum within one quantum per item of 1
    total = sum(w.values())
    assert abs(total - 1) <= Fraction(len(w), BT_SCALE)


def test_pair_order_invariance():
    pairs = _planted_pairs()
    assert bt_fixed_point(pairs) == bt_fixed_point(list(reversed(pairs)))


def test_all_grid_values():
    for v in bt_fixed_point(_planted_pairs()).values():
        assert (v.numerator * (BT_SCALE // v.denominator)) % 1 == 0
        assert BT_SCALE % v.denominator == 0


def test_empty_and_tie_only_inputs_raise():
    with pytest.raises(ValueError, match="no decisive"):
        bt_fixed_point([])
    with pytest.raises(ValueError, match="no decisive"):
        bt_fixed_point([("a", "b", 0, 0)])


def test_spark_wrapper_bookkeeping(spark):
    df = spark.createDataFrame(
        _planted_pairs(), "item_a string, item_b string, wins_a long, wins_b long"
    )
    out = {r["item"]: r for r in bt_strengths(df).collect()}
    assert set(out) == {"a", "b", "c"}
    # every item played the other two: games = 240 each; wins sum to the
    # total decisive games across the table
    assert all(out[i]["games"] == 240 for i in out)
    assert sum(out[i]["wins"] for i in out) == 3 * 120
    assert out["a"]["strength"] > out["b"]["strength"] > out["c"]["strength"]


def test_pair_cap_raises(spark, monkeypatch):
    """BT_MAX_PAIRS loud guard (r11): a pair table beyond the documented
    bound raises a named error instead of OOMing the driver-side MM fit."""
    from aci_export_spark.operators import preferences as P

    monkeypatch.setattr(P, "BT_MAX_PAIRS", 2)
    rows = [("a", "b", 1, 2), ("a", "c", 2, 1), ("b", "c", 3, 1)]
    df = spark.createDataFrame(
        rows, "item_a string, item_b string, wins_a long, wins_b long"
    )
    with pytest.raises(ValueError, match="BT_MAX_PAIRS"):
        P.bt_strengths(df)
