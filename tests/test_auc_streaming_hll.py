"""Sixth-wave operators: exact Mann-Whitney retrieval AUC
(llm/similarity.py) and streaming HLL register maintenance
(streaming/core.py): hand-computed U statistics, the quantization-grid
exactness argument, perfect/inverted ranking endpoints, and stream ≡
rebuild with an overlap-tolerance demonstration the count-based indexes
cannot give."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aci_export_spark.llm.similarity import retrieval_auc


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    )


def test_auc_perfect_ranking(spark):
    """All positives closer than all negatives → AUC = 1."""
    rows = [
        (0, [1.0, 0.0], 1),  # query
        (1, [0.99, 0.01], 1),
        (2, [0.98, 0.02], 1),
        (3, [-1.0, 0.0], 2),
        (4, [-0.9, -0.1], 2),
    ]
    df = _emb(spark, rows)
    r = retrieval_auc(df, df.filter(F.col("vec_id") == 0)).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc_num_2x"] == r["auc_den_2x"] == 8
    assert r["auc"] == 1.0


def test_auc_inverted_ranking(spark):
    """All negatives closer than all positives → AUC = 0."""
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [-1.0, 0.0], 1),
        (2, [-0.9, -0.2], 1),
        (3, [0.99, 0.01], 2),
        (4, [0.98, 0.02], 2),
    ]
    df = _emb(spark, rows)
    r = retrieval_auc(df, df.filter(F.col("vec_id") == 0)).collect()[0]
    assert r["auc_num_2x"] == 0 and r["auc"] == 0.0


def test_auc_hand_computed_mixed(spark):
    """Interleaved ranking, hand-checked U: distances from q=(1,0) —
    v1 (pos) closest, v3 (neg) next, v2 (pos) next, v4 (neg) farthest.
    Ascending-similarity ranks: v4=1, v2=2, v3=3, v1=4 (no ties, so
    2×-midranks are just doubled dense ranks) →
    rank_sum_pos_2x = 4 + 8 = 12, 2U = 12 - 2·3 = 6, AUC = 6/8 = 3/4."""
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.999, 0.0], 1),   # pos, nearest
        (2, [0.0, 0.5], 1),     # pos, third
        (3, [0.5, 0.25], 2),    # neg, second
        (4, [-1.0, 0.0], 2),    # neg, farthest
    ]
    df = _emb(spark, rows)
    r = retrieval_auc(df, df.filter(F.col("vec_id") == 0)).collect()[0]
    assert r["rank_sum_pos_2x"] == 12
    assert (r["auc_num_2x"], r["auc_den_2x"]) == (6, 8)
    assert r["auc"] == 0.75


def test_auc_tied_distances_take_midranks(spark):
    """A pos/neg pair at the SAME quantized distance contributes exactly
    ½ (the standard tie-corrected U) — not 0 or 1 by id order (r10
    advice retired the neighbor_id tie-break)."""
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 1),   # pos: d2 = 1024² + 1024²
        (2, [0.0, -1.0], 2),  # neg: d2 = 1024² + 1024² — exact tie
    ]
    df = _emb(spark, rows)
    r = retrieval_auc(df, df.filter(F.col("vec_id") == 0)).collect()[0]
    # tie group spans dense ranks [1,2]: rank2x = 2·1 + 2 − 1 = 3
    assert r["rank_sum_pos_2x"] == 3
    assert (r["auc_num_2x"], r["auc_den_2x"]) == (1, 2)
    assert r["auc"] == 0.5


def test_auc_python_replay_on_corpus(spark):
    """Differential vs a numpy replay of the quantized-distance ranking
    over the real embeddings table."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r["query_id"]: (r["n_pos"], r["rank_sum_pos_2x"])
        for r in retrieval_auc(emb, emb.filter(F.col("vec_id") < 3)).collect()
    }
    rows = emb.collect()
    vecs = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 1024
        ).astype(np.int64)
        for r in rows
    }
    labels = {r["vec_id"]: r["label"] for r in rows}
    for qid in (0, 1, 2):
        # rank 1 = farthest (ascending similarity): sort d2 DESCENDING;
        # ties share the 2×-scaled midrank 2·start + count − 1
        scored = sorted(
            (
                (int(((vecs[qid] - vecs[nid]) ** 2).sum()), nid)
                for nid in vecs
                if nid != qid
            ),
            key=lambda t: -t[0],
        )
        rank2x = {}
        i = 0
        while i < len(scored):
            j = i
            while j < len(scored) and scored[j][0] == scored[i][0]:
                j += 1
            for _, nid in scored[i:j]:
                rank2x[nid] = 2 * (i + 1) + (j - i) - 1
            i = j
        rank_sum_2x = sum(
            r for nid, r in rank2x.items() if labels[nid] == labels[qid]
        )
        n_pos = sum(
            1 for nid in vecs if nid != qid and labels[nid] == labels[qid]
        )
        assert got[qid] == (n_pos, rank_sum_2x), qid


def test_auc_quantization_is_exact_integers(spark):
    """floor(x·1024) on float32 inputs is exact in the double domain —
    the ranking key is int64, never an IEEE comparison."""
    df = _emb(spark, [(0, [0.1, -0.3], 1), (1, [0.5, 0.25], 1)])
    out = retrieval_auc(df, df.filter(F.col("vec_id") == 0))
    assert dict(out.dtypes)["rank_sum_pos_2x"] == "bigint"
    assert dict(out.dtypes)["auc_num_2x"] == "bigint"


# ---------------------------------------------------------------------------
# streaming HLL index
# ---------------------------------------------------------------------------


def test_streaming_hll_equals_batch_rebuild(spark):
    from aci_export_spark.llm.text import word_tokens
    from aci_export_spark.operators.sketches import hll_estimate, hll_registers
    from aci_export_spark.streaming.core import hll_index_stream

    sf = "/root/testdata/sf0.001"
    counter: dict = {}
    streamed = hll_index_stream(spark, sf, n_files=4, batch_counter=counter)
    assert counter["batches"] >= 2
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = docs.select("lang", F.explode(word_tokens(F.col("text"))).alias("tok"))
    rebuilt = hll_estimate(hll_registers(toks, "tok", ["lang"]), ["lang"])
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in rebuilt.collect()}
    assert s == b


def test_hll_merge_tolerates_overlap(spark):
    """The max-merge needs NO disjointness: merging the WHOLE corpus's
    registers into themselves (total overlap — the at-least-once
    redelivery case) is a no-op, where the count-based gram/chunk merges
    would double every count."""
    from aci_export_spark.llm.text import word_tokens
    from aci_export_spark.operators.sketches import hll_registers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select("lang", F.explode(word_tokens(F.col("text"))).alias("tok"))
    regs = hll_registers(toks, "tok", ["lang"])
    remerged = (
        regs.unionByName(regs)
        .groupBy("lang", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    a = {tuple(r) for r in regs.collect()}
    b = {tuple(r) for r in remerged.collect()}
    assert a == b
