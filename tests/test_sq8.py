"""SQ8 scalar-quantized ANN (llm/similarity.py): quantization exactness vs
a numpy replay, and recall@k of the compressed scan against the exact
brute-force ground truth."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from aci_export_spark.llm import similarity as S

SF_DIR = "/root/testdata/sf0.01"


def _emb(spark):
    from aci_export_spark.sources import read_table

    return read_table(spark, SF_DIR, "embeddings")


def test_codes_match_numpy_replay(spark):
    emb = _emb(spark)
    mn, mx = S.sq8_minmax_fit(emb)
    rows = emb.filter(F.col("vec_id") < 10).select(
        "vec_id", "embedding", S.sq8_code(F.col("embedding"), mn, mx).alias("code")
    ).collect()
    mn_a, mx_a = np.array(mn), np.array(mx)
    rng = mx_a - mn_a
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        expect = np.where(
            rng > 0,
            np.clip(np.floor(((v - mn_a) * 255.0) / np.where(rng > 0, rng, 1.0)), 0, 255),
            0,
        ).astype(np.int64)
        assert list(expect) == list(r["code"]), f"vec {r['vec_id']}"


def test_minmax_fit_is_exact(spark):
    emb = _emb(spark)
    mn, mx = S.sq8_minmax_fit(emb)
    arr = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    assert np.array_equal(np.array(mn), arr.min(axis=0))
    assert np.array_equal(np.array(mx), arr.max(axis=0))
    assert len(mn) == arr.shape[1]


def test_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in S.sq8_topk(emb, queries, k=5, shortlist=15).collect()
    }
    recall = len(truth & got) / len(truth)
    # 8-bit per-dim quantization is near-lossless at dim 64; anything below
    # 0.9 means the quantized distances stopped tracking the exact ones
    assert recall >= 0.9, f"recall@5 {recall}"


def test_adc_rank_within_shortlist_bound(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    rows = S.sq8_topk(emb, queries, k=5, shortlist=15).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert 1 <= r["adc_rank"] <= 15
        assert r["sq8_dist"] >= 0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, 6)), f"query {q}"


def test_ivf_sq8_recall_vs_bruteforce(spark):
    from aci_export_spark.llm.similarity import (
        ivf_assign_centroids,
        ivf_sq8_topk,
        kmeans_fit_sample,
    )

    emb = _emb(spark)
    cents = kmeans_fit_sample(emb, k_cells=8, seed=42, sample_rows=2048)
    assigned = ivf_assign_centroids(emb, cents)
    queries = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    got_rows = ivf_sq8_topk(assigned, queries, cents, nprobe=3, shortlist=15, k=5).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    # two approximations stack (cell pruning + 8-bit ADC shortlist);
    # nprobe=3/8 cells should still recover well over half of exact top-5
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"recall@5 {recall}"
    assert all(r["sq8_dist"] >= 0 for r in got_rows)
