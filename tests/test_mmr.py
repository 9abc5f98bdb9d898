"""MMR re-ranking validation: unit semantics of the greedy, λ=1 equivalence
to straight relevance ranking, measured diversity gain, and bit-match of the
distributed query against the single-process golden."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aci_export_spark.llm import similarity as S
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_mmr_select_prefers_diverse_over_duplicate():
    """Canonical MMR behavior: with a duplicate of the best hit in the pool,
    the second pick is the slightly-less-relevant but DIVERSE candidate, not
    the exact copy (straight top-2 would take the copy)."""
    q = [1.0, 0.0, 0.0]
    d1 = [0.9, 0.43589, 0.0]  # cos(q,·) = 0.9
    d2 = list(d1)  # exact duplicate, higher id
    d3 = [0.85, 0.0, 0.526783]  # cos(q,·) = 0.85, cos(·,d1) ≈ 0.765
    picked = S._mmr_select(q, [1, 3, 7], [d1, d2, d3], k=2, lam=0.6)
    assert picked == [1, 7]
    # λ=1 degenerates to pure relevance: the duplicate comes back
    assert S._mmr_select(q, [1, 3, 7], [d1, d2, d3], k=2, lam=1.0) == [1, 3]


def test_mmr_select_ties_break_on_id():
    q = [1.0, 0.0]
    v = [0.6, 0.8]
    # identical vectors → identical scores at every step → id order
    assert S._mmr_select(q, [9, 2, 5], [v, list(v), list(v)], k=3, lam=0.7) == [
        2,
        5,
        9,
    ]


def test_mmr_lambda_one_equals_relevance_ranking(spark):
    """With λ=1 the greedy must reproduce brute-force top-k exactly —
    including ranks — on real data through the full Arrow path."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    pool = S.brute_force_topk(emb, queries, k=12)
    qv = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"))
    cv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__cv"))
    cands = (
        pool.join(F.broadcast(qv), on="query_id")
        .join(cv, on="neighbor_id")
        .select("query_id", "neighbor_id", "__qv", "__cv")
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["mmr_rank"])
        for r in S.mmr_rerank(cands, k=5, lam=1.0).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    assert got == want


def _mean_pairwise_cos(vecs: list[list[float]]) -> float:
    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    n = len(vecs)
    norms = [math.sqrt(dot(v, v)) for v in vecs]
    total = cnt = 0
    for i in range(n):
        for j in range(i + 1, n):
            total += dot(vecs[i], vecs[j]) / (norms[i] * norms[j])
            cnt += 1
    return total / cnt


def test_mmr_reduces_mean_redundancy_on_fixture(spark):
    """On the fixture corpus (deterministic), the λ=0.7 selection's mean
    pairwise cosine must not exceed the straight top-5's — the diversity
    objective, measured."""
    from aci_export_spark.harness_llm import llm_sim_mmr_rerank

    emb = read_table(spark, SF_SMOKE, "embeddings")
    vec_by_id = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    mmr_sel: dict[int, list[int]] = {}
    for r in llm_sim_mmr_rerank(spark, SF_SMOKE).collect():
        mmr_sel.setdefault(r["query_id"], []).append(r["neighbor_id"])
    top_sel: dict[int, list[int]] = {}
    queries = emb.filter(F.col("vec_id") < 20)
    for r in S.brute_force_topk(emb, queries, k=5).collect():
        top_sel.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(mmr_sel) == set(top_sel) and all(len(v) == 5 for v in mmr_sel.values())
    mmr_red = sum(
        _mean_pairwise_cos([vec_by_id[i] for i in ids]) for ids in mmr_sel.values()
    )
    top_red = sum(
        _mean_pairwise_cos([vec_by_id[i] for i in ids]) for ids in top_sel.values()
    )
    assert mmr_red <= top_red + 1e-12, (mmr_red, top_red)


def test_mmr_matches_numpy_golden(spark):
    from aci_export_spark.harness_llm import llm_sim_mmr_rerank

    got = sorted(
        (r["query_id"], r["neighbor_id"], r["mmr_rank"])
        for r in llm_sim_mmr_rerank(spark, SF_SMOKE).collect()
    )
    want = sorted(
        S.mmr_reference_numpy(
            f"{SF_SMOKE}/embeddings.parquet", pool=12, k=5, lam=0.7, n_queries=20
        )
    )
    assert got == want
