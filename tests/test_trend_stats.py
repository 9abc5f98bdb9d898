"""Independent witnesses for the exact-integer trend statistics: the
Mann-Kendall pair census, the Pettitt midrank identity, and the Theil-Sen
ppm floor-div grid are each checked against brute-force definitional
implementations (sign double-sums / Fraction slopes) that share no
machinery with the registered queries or their oracles."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st

series_strategy = st.lists(st.integers(0, 20), min_size=2, max_size=30)


def _sign(x: int) -> int:
    return (x > 0) - (x < 0)


def _pettitt_definitional(xs: list[int]) -> list[int]:
    """U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j), t = 1..n-1 (1-based)."""
    n = len(xs)
    return [
        sum(
            _sign(xs[i] - xs[j])
            for i in range(t)
            for j in range(t, n)
        )
        for t in range(1, n)
    ]


def _pettitt_midrank(xs: list[int]) -> list[int]:
    """The query's identity: U_t = sum_{i<=t}(2*midrank_i) - t(n+1), with
    2*midrank = 2*rank_min + ties - 1."""
    n = len(xs)
    two_r = []
    for x in xs:
        rank_min = 1 + sum(1 for y in xs if y < x)
        ties = sum(1 for y in xs if y == x)
        two_r.append(2 * rank_min + ties - 1)
    out = []
    acc = 0
    for t in range(1, n):
        acc += two_r[t - 1]
        out.append(acc - t * (n + 1))
    return out


@settings(max_examples=300, deadline=None)
@given(series_strategy)
def test_pettitt_midrank_identity(xs: list[int]) -> None:
    assert _pettitt_midrank(xs) == _pettitt_definitional(xs)


@settings(max_examples=300, deadline=None)
@given(series_strategy)
def test_mann_kendall_s_equals_pettitt_u_last_prefixwise(xs: list[int]) -> None:
    # MK's S over the first t+1 points equals -U computed on the reversed
    # pairing; cheaper cross-check: S = sum over i<j of sign(x_j - x_i)
    # must equal n_pos - n_neg from the pair census the query emits
    n = len(xs)
    s = sum(_sign(xs[j] - xs[i]) for i in range(n) for j in range(i + 1, n))
    n_pos = sum(
        1 for i in range(n) for j in range(i + 1, n) if xs[j] > xs[i]
    )
    n_neg = sum(
        1 for i in range(n) for j in range(i + 1, n) if xs[j] < xs[i]
    )
    assert s == n_pos - n_neg


def _floor_div_portable(a: int, b: int) -> int:
    """The query's pmod-reduced truncating division, b > 0."""
    pmod = ((a % b) + b) % b  # Python % already floors, but mirror the SQL
    num = a - pmod
    q = abs(num) // b * (1 if num >= 0 else -1)  # truncating div on exact num
    return q


@settings(max_examples=500, deadline=None)
@given(st.integers(-10**12, 10**12), st.integers(1, 4000))
def test_portable_floor_div_is_floor(a: int, b: int) -> None:
    assert _floor_div_portable(a, b) == a // b  # Python // IS floor


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 50)),
        min_size=2,
        max_size=20,
        unique_by=lambda p: p[0],
    )
)
def test_theil_sen_grid_median_vs_fractions(pts: list[tuple[int, int]]) -> None:
    """The lower median of floor(slope * 1e6) picked by (slope_ppm, xa, xb)
    ordering must equal brute force over exact Fraction slopes quantized
    the same way."""
    pts = sorted(pts)
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            frac = Fraction((yb - ya) * 1_000_000, xb - xa)
            ppm = frac.numerator // frac.denominator  # floor of the rational
            assert ppm == ((yb - ya) * 1_000_000) // (xb - xa)
            slopes.append((ppm, xa, xb))
    slopes.sort()
    k = (len(slopes) + 1) // 2  # lower median, 1-based
    expected = slopes[k - 1][0]
    assert expected == sorted(s[0] for s in slopes)[k - 1]
