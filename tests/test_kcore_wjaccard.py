"""k-core decomposition (operators/graph.kcore_decomposition) and weighted
Jaccard pairs (llm/dedup.weighted_jaccard_pairs): hand-verified corenesses,
distributed-h-index ≡ bounded-peeling equivalence, and exact weighted
overlap arithmetic."""

from __future__ import annotations

from aci_export_spark.llm.dedup import weighted_jaccard_pairs
from aci_export_spark.operators.graph import kcore_decomposition

# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


#: a 4-clique (core 3) bridged through e to a triangle, plus a pendant:
#: the bridge e has degree 2 with BOTH neighbors in denser structures, so
#: the whole clique-e-triangle subgraph survives the k=2 peel (coreness 2
#: for e — the non-obvious case naive "e looks like a tail" reasoning gets
#: wrong); the pendant p hangs off e and peels at k=1.
EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("d", "e"), ("e", "f"),
    ("f", "g"), ("g", "h"), ("h", "f"),
    ("e", "p"),
]
WANT = {
    "a": 3, "b": 3, "c": 3, "d": 3,
    "e": 2, "f": 2, "g": 2, "h": 2,
    "p": 1,
}


def test_kcore_hand_verified_bounded(spark):
    got = {
        r["node"]: r["core"]
        for r in kcore_decomposition(_edges_df(spark, EDGES), bounded=True).collect()
    }
    assert got == WANT


def test_kcore_distributed_equals_bounded(spark):
    """The h-index fixed point (distributed) and Batagelj-Zaveršnik peeling
    (bounded) are the same function — asserted on a graph with duplicate
    and self edges thrown in (both paths dedupe/drop them)."""
    edges = EDGES + [("b", "a"), ("a", "a"), ("d", "c")]
    df = _edges_df(spark, edges)
    dist = {r["node"]: r["core"] for r in kcore_decomposition(df).collect()}
    bnd = {
        r["node"]: r["core"]
        for r in kcore_decomposition(df, bounded=True).collect()
    }
    assert dist == bnd == WANT


def test_kcore_star_is_all_ones(spark):
    star = [("hub", f"s{i}") for i in range(6)]
    got = {
        r["node"]: r["core"]
        for r in kcore_decomposition(_edges_df(spark, star), bounded=True).collect()
    }
    assert got == {"hub": 1, **{f"s{i}": 1 for i in range(6)}}


# ---------------------------------------------------------------------------
# weighted Jaccard
# ---------------------------------------------------------------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_weighted_jaccard_hand_computed(spark):
    rows = [
        (1, "apple apple banana", "en"),     # tf: apple 2, banana 1
        (2, "apple banana banana kiwi", "en"),  # tf: apple 1, banana 2, kiwi 1
        (3, "apple apple banana", "de"),     # same text, other bucket
    ]
    out = {
        (r["id_a"], r["id_b"]): r["wjacc_ppm"]
        for r in weighted_jaccard_pairs(
            _docs_df(spark, rows), "doc_id", "text", "lang",
            threshold_ppm=1, df_cap=50,
        ).collect()
    }
    # smin = min(2,1) + min(1,2) = 2; union = 3 + 4 - 2 = 5 -> 0.4
    assert out == {(1, 2): 400_000}


def test_weighted_jaccard_df_cap_excludes_stop_tokens(spark):
    # 'the' appears in 3 docs -> df 3 > cap 2: excluded from features AND
    # totals; remaining overlap drives the score
    rows = [
        (1, "the alpha", "en"),
        (2, "the alpha", "en"),
        (3, "the beta", "en"),
    ]
    out = {
        (r["id_a"], r["id_b"]): r["wjacc_ppm"]
        for r in weighted_jaccard_pairs(
            _docs_df(spark, rows), "doc_id", "text", "lang",
            threshold_ppm=1, df_cap=2,
        ).collect()
    }
    # only (1,2) share a featured token (alpha, df=2): J_w = 1/1
    assert out == {(1, 2): 1_000_000}


def test_weighted_jaccard_vs_set_jaccard_on_repeats(spark):
    """Repetition changes the weighted measure where the set measure is
    blind: doc 2 repeats 'apple' 5x — set-Jaccard with doc 1 is 1.0, the
    weighted measure correctly discounts it."""
    rows = [
        (1, "apple banana", "en"),
        (2, "apple apple apple apple apple banana", "en"),
    ]
    out = weighted_jaccard_pairs(
        _docs_df(spark, rows), "doc_id", "text", "lang",
        threshold_ppm=1, df_cap=50,
    ).collect()
    # smin = 1 + 1 = 2; union = 2 + 6 - 2 = 6 -> 1/3
    assert [(r["id_a"], r["id_b"], r["wjacc_ppm"]) for r in out] == [(1, 2, 333_333)]


def test_weighted_jaccard_threshold_is_exact(spark):
    rows = [
        (1, "x x y", "en"),   # tf x2 y1
        (2, "x y y", "en"),   # tf x1 y2 -> smin 2, union 4 -> exactly 0.5
    ]
    df = _docs_df(spark, rows)
    at = weighted_jaccard_pairs(df, "doc_id", "text", "lang", 500_000).collect()
    above = weighted_jaccard_pairs(df, "doc_id", "text", "lang", 500_001).collect()
    assert len(at) == 1 and at[0]["wjacc_ppm"] == 500_000
    assert above == []
