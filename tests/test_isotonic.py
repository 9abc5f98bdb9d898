"""PAV isotonic fit: the engine's O(n) stack vs the definitional O(n^2)
rescan reference on random grids (including heavy ties), monotonicity and
mass-conservation invariants, and the loud grid cap."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark.operators.isotonic import pav_pools

grid_strategy = st.lists(
    st.tuples(st.integers(1, 30), st.integers(0, 30)),  # (n, y<=? not forced)
    min_size=1,
    max_size=40,
)


def _definitional_pav(stats):
    pools = [[x, x, n, y] for x, n, y in stats]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            xa0, xa1, na, ya = pools[i]
            xb0, xb1, nb, yb = pools[i + 1]
            if ya * nb > yb * na:
                pools[i : i + 2] = [[xa0, xb1, na + nb, ya + yb]]
                changed = True
                break
    return [tuple(p) for p in pools]


@settings(max_examples=300, deadline=None)
@given(grid_strategy)
def test_stack_matches_definitional(raw) -> None:
    stats = [(x, n, min(y, n)) for x, (n, y) in enumerate(raw)]
    assert pav_pools(stats) == _definitional_pav(stats)


@settings(max_examples=300, deadline=None)
@given(grid_strategy)
def test_pools_invariants(raw) -> None:
    stats = [(x, n, min(y, n)) for x, (n, y) in enumerate(raw)]
    pools = pav_pools(stats)
    # mass conservation
    assert sum(p[2] for p in pools) == sum(n for _, n, _ in stats)
    assert sum(p[3] for p in pools) == sum(y for _, _, y in stats)
    # contiguous, ordered x coverage
    assert pools[0][0] == stats[0][0] and pools[-1][1] == stats[-1][0]
    for a, b in zip(pools, pools[1:]):
        assert a[1] < b[0]
        # levels non-decreasing (exact cross-multiply)
        assert a[3] * b[2] <= b[3] * a[2]


def test_tied_levels_stay_separate_pools() -> None:
    # equal adjacent levels are NOT violations; boundaries must survive
    stats = [(0, 2, 1), (1, 4, 2), (2, 2, 2)]  # levels 1/2, 1/2, 1
    assert pav_pools(stats) == [(0, 0, 2, 1), (1, 1, 4, 2), (2, 2, 2, 2)]


def test_single_violation_merges() -> None:
    stats = [(0, 1, 1), (1, 1, 0)]  # 1 > 0 -> one pool at 1/2
    assert pav_pools(stats) == [(0, 1, 2, 1)]


def test_grid_cap_trips_loudly(spark_session=None) -> None:
    from aci_export_spark.operators.isotonic import isotonic_fit
    from aci_export_spark.session import get_spark

    spark = get_spark()
    df = spark.range(50).selectExpr("id AS x", "id % 2 AS y")
    with pytest.raises(ValueError, match="MAX_ISO_GRID"):
        isotonic_fit(spark, df, "x", "y", max_grid=10)
