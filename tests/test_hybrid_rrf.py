"""Hybrid retrieval validation: RRF fusion semantics and the more-like-this
BM25 ranker's basic contracts (the end-to-end ranking equality vs DuckDB is
covered by the registry-wide oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm.retrieval import mlt_bm25_topk, rrf_fuse
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE


def _ranks(spark, rows):
    return spark.createDataFrame(rows, schema="query_id long, doc_id long, rank int")


def test_rrf_both_lists_beats_single_list_at_equal_rank(spark):
    sparse = _ranks(spark, [(1, 10, 1), (1, 11, 2)])
    dense = _ranks(spark, [(1, 11, 1), (1, 12, 2)])
    out = {r["doc_id"]: r for r in rrf_fuse(sparse, dense, k=3).collect()}
    # doc 11 appears in both lists (1/62 + 1/61) and must outrank both
    # single-list docs (1/61 and 1/62 alone)
    assert out[11]["fused_rank"] == 1
    assert out[11]["in_sparse"] and out[11]["in_dense"]
    # sparse-rank-1 (1/61) beats dense-rank-2 (1/62)
    assert out[10]["fused_rank"] == 2 and not out[10]["in_dense"]
    assert out[12]["fused_rank"] == 3 and not out[12]["in_sparse"]


def test_rrf_equal_scores_tie_break_on_doc_id(spark):
    # same single-list rank → exactly equal IEEE scores → doc_id order
    sparse = _ranks(spark, [(1, 20, 1)])
    dense = _ranks(spark, [(1, 5, 1)])
    rows = rrf_fuse(sparse, dense, k=2).collect()
    assert [(r["doc_id"], r["fused_rank"]) for r in sorted(rows, key=lambda r: r["fused_rank"])] == [
        (5, 1),
        (20, 2),
    ]


def test_rrf_respects_per_query_isolation(spark):
    sparse = _ranks(spark, [(1, 10, 1), (2, 30, 1)])
    dense = _ranks(spark, [(1, 10, 1), (2, 31, 1)])
    rows = rrf_fuse(sparse, dense, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q == {1: {10}, 2: {30, 31}}


def test_mlt_bm25_excludes_self_and_bounds_pool(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    out = mlt_bm25_topk(docs, n_queries=5, n_terms=3, pool=7)
    rows = out.collect()
    assert all(r["query_id"] != r["doc_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 7
