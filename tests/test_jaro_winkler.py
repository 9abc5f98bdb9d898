"""Jaro-Winkler comparator (operators/fuzzy.jw_ppm / jaro_winkler_pairs):
engine-vs-reference property fuzz (two independently structured
implementations of the same integer spec), canonical textbook vectors, and
the pair operator's blocking/threshold contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aci_export_spark.operators.fuzzy import jaro_winkler_pairs, jw_ppm


def _ref_jw(a: str, b: str) -> int:
    """The position-queue reference (the structure jw_reference_python
    uses), inlined so the fuzz runs without DuckDB."""
    from collections import deque

    if a == b:
        return 1_000_000 if a else 0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0
    w = max(max(la, lb) // 2 - 1, 0)
    pos: dict = {}
    for j, ch in enumerate(b):
        pos.setdefault(ch, deque()).append(j)
    a_hits, b_hits = [], []
    for i, ch in enumerate(a):
        q = pos.get(ch)
        if not q:
            continue
        while q and q[0] < i - w:
            q.popleft()
        if q and q[0] <= i + w:
            b_hits.append(q.popleft())
            a_hits.append(i)
    m = len(a_hits)
    if m == 0:
        return 0
    k = sum(1 for i, j in zip(a_hits, sorted(b_hits)) if a[i] != b[j])
    jn = 2 * m * m * lb + 2 * m * m * la + (2 * m - k) * la * lb
    jd = 6 * la * lb * m
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return 1_000_000 * (10 * jn + l * (jd - jn)) // (10 * jd)


@given(
    a=st.text(alphabet="abcdef ", max_size=16),
    b=st.text(alphabet="abcdef ", max_size=16),
)
@settings(max_examples=400, deadline=None)
def test_engine_and_reference_agree(a, b):
    assert jw_ppm(a, b) == _ref_jw(a, b)


def test_canonical_vectors():
    # MARTHA/MARHTA: m=6, t=1, jaro=0.944..., l=3 -> jw=0.961111
    assert jw_ppm("martha", "marhta") == 961_111
    # DIXON/DICKSONX: m=4, t=0, jaro=0.766666, l=2 -> jw=0.813333
    assert jw_ppm("dixon", "dicksonx") == 813_333
    # DWAYNE/DUANE: m=4, t=0, jaro=0.822222, l=1 -> jw=0.84
    assert jw_ppm("dwayne", "duane") == 840_000


def test_edge_cases_and_bounds():
    assert jw_ppm("", "") == 0
    assert jw_ppm("a", "") == 0
    assert jw_ppm("abc", "abc") == 1_000_000
    assert jw_ppm("abc", "xyz") == 0
    # symmetry and the [0, 1e6] range
    for a, b in [("kitten", "sitting"), ("ab", "ba"), ("aaaa", "aa")]:
        assert jw_ppm(a, b) == jw_ppm(b, a)
        assert 0 <= jw_ppm(a, b) <= 1_000_000


def test_pair_operator_blocks_and_thresholds(spark):
    rows = [
        (1, "small ring", "B1"),
        (2, "small rings", "B1"),   # near-dup, same block
        (3, "small ring", "B2"),    # identical text, DIFFERENT block
        (4, "hot gear", "B1"),      # same block, dissimilar
    ]
    df = spark.createDataFrame(rows, "id long, name string, brand string")
    out = {
        (r["id_a"], r["id_b"]): r["jw_ppm"]
        for r in jaro_winkler_pairs(
            df, "id", "name", ["brand"], threshold_ppm=900_000
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == jw_ppm("small ring", "small rings")
    assert all(a != 3 and b != 3 for a, b in out)  # blocking respected
    assert (1, 4) not in out  # threshold respected


# ---------------------------------------------------------------------------
# r10 prefilter: the histogram bound must be NECESSARY (no false negatives)
# ---------------------------------------------------------------------------


def _hist_bound_passes(a: str, b: str, threshold_ppm: int) -> bool:
    """Python replay of the JVM prefilter predicate in jaro_winkler_pairs:
    26-letter histogram + one other-chars class, I·(la+lb)·1e6 >=
    (5T−3e6)·la·lb."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    c_ppm = 5 * threshold_ppm - 3_000_000
    if c_ppm <= 0:
        return True
    la, lb = len(a), len(b)
    isect = sum(min(a.count(ch), b.count(ch)) for ch in alpha)
    oa = la - sum(a.count(ch) for ch in alpha)
    ob = lb - sum(b.count(ch) for ch in alpha)
    isect += min(oa, ob)
    return isect * (la + lb) * 1_000_000 >= c_ppm * la * lb


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="abcdez 19", min_size=1, max_size=24),
    st.text(alphabet="abcdez 19", min_size=1, max_size=24),
)
def test_histogram_prefilter_is_necessary(a, b):
    """Every pair the comparator accepts must pass the prefilter — a false
    negative would silently drop a true linkage pair. (The alphabet mixes
    letters, digits and space so the other-chars class is exercised.)"""
    from aci_export_spark.operators.fuzzy import jw_ppm

    for t in (700_000, 900_000, 980_000):
        if jw_ppm(a, b) >= t:
            assert _hist_bound_passes(a, b, t), (a, b, t)


def test_histogram_prefilter_culls_something():
    """Sanity: the bound is not vacuous — clearly-dissimilar strings fail."""
    assert not _hist_bound_passes("aaaaaaaaaa", "zzzzzzzzzz", 900_000)
    assert _hist_bound_passes("martha", "marhta", 900_000)


# ---------------------------------------------------------------------------
# r11: length band necessity + sorted-neighborhood dial
# ---------------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="abcdez 19", min_size=1, max_size=24),
    st.text(alphabet="abcdez 19", min_size=1, max_size=24),
)
def test_length_band_is_necessary(a, b):
    """The join-condition length band (min·1e6 >= (5T−4e6)·max) must never
    drop a pair the comparator accepts."""
    la, lb = len(a), len(b)
    for t in (850_000, 900_000, 980_000):
        band = 5 * t - 4_000_000
        if jw_ppm(a, b) >= t and band > 0:
            assert min(la, lb) * 1_000_000 >= band * max(la, lb), (a, b, t)


def _jw_pairs_set(spark, rows, threshold, neighborhood):
    df = spark.createDataFrame(rows, "id long, name string, brand string")
    return {
        (r["id_a"], r["id_b"], r["jw_ppm"])
        for r in jaro_winkler_pairs(
            df, "id", "name", ["brand"],
            threshold_ppm=threshold, neighborhood=neighborhood,
        ).collect()
    }


def test_neighborhood_subset_and_wide_window_equality(spark):
    """The two-pass sorted-neighborhood candidates are a SUBSET of the
    exhaustive block pairs, and a window at least the block size makes
    the two estimands identical (every pair is within W positions)."""
    rows = [
        (i, n, "B1")
        for i, n in enumerate(
            ["small ring", "small rings", "smalt ring", "hot gear",
             "hot gears", "warm gear", "tiny bolt", "tiny bolts"]
        )
    ] + [(100, "small ring", "B2"), (101, "small rinh", "B2")]
    exact = _jw_pairs_set(spark, rows, 880_000, None)
    narrow = _jw_pairs_set(spark, rows, 880_000, 1)
    wide = _jw_pairs_set(spark, rows, 880_000, 64)
    assert narrow <= exact
    assert wide == exact
    assert len(exact) >= 4  # the fixture genuinely links several pairs


def test_neighborhood_reverse_pass_recovers_prefix_edits(spark):
    """A pair differing at the FRONT of the string sorts far apart in the
    forward pass; the reversed-name pass must still surface it even at
    W=1 when they are reverse-adjacent."""
    # aa…/ba… differ at position 1 → forward-sort separates them by the
    # whole block; reversed strings share the long suffix → adjacent
    mid = ["%c%c fixed suffix" % (c, d) for c in "cdefghijklmnopq" for d in "xy"]
    rows = [(0, "aa fixed suffix", "B"), (999, "ab fixed suffix", "B")] + [
        (i + 1, n, "B") for i, n in enumerate(mid)
    ]
    got = _jw_pairs_set(spark, rows, 900_000, 1)
    assert any(a == 0 and b == 999 for a, b, _ in got)
