"""Compaction planner (operators/maintenance.py) and binary-Hamming ANN
(llm/similarity.py pack_sign_bits / binary_hamming_topk): packing
bit-exactness vs numpy, Hamming agreement, shortlist recall, and the
bin-packing invariants."""

from __future__ import annotations

import numpy as np

from aci_export_spark.llm.similarity import binary_hamming_topk, pack_sign_bits
from aci_export_spark.operators.maintenance import compaction_plan

# ---------------------------------------------------------------------------
# compaction planner
# ---------------------------------------------------------------------------


def _catalog(spark, rows):
    return spark.createDataFrame(rows, "part string, key long, bytes long")


def test_compaction_conserves_files_and_bytes(spark):
    rows = [("p", k, 100 + (k * 37) % 400) for k in range(50)]
    out = compaction_plan(_catalog(spark, rows), "part", "key", "bytes", 1000).collect()
    assert sum(r["n_files"] for r in out) == 50
    assert sum(r["group_bytes"] for r in out) == sum(b for _, _, b in rows)
    # groups tile the key range in order without overlap
    spans = sorted((r["min_key"], r["max_key"]) for r in out)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_compaction_groups_near_target_and_flags_oversize(spark):
    rows = [("p", k, 300) for k in range(10)] + [("p", 100, 5000)]
    out = {r["group_id"]: r for r in compaction_plan(
        _catalog(spark, rows), "part", "key", "bytes", 1000
    ).collect()}
    # 300-byte files pack 4 per group (group switches when cum crosses 1000)
    first = out[0]
    assert first["n_files"] == 4 and first["group_bytes"] == 1200
    assert first["oversized"]  # straddler joins the group it started in
    # the single 5000-byte file occupies its own group, flagged oversized
    big = [r for r in out.values() if r["min_key"] == 100]
    assert len(big) == 1 and big[0]["n_files"] == 1 and big[0]["oversized"]


def test_compaction_partitions_are_independent(spark):
    rows = [("a", k, 400) for k in range(4)] + [("b", k, 400) for k in range(4)]
    out = compaction_plan(_catalog(spark, rows), "part", "key", "bytes", 1000).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r["part"], []).append(r)
    assert set(by_part) == {"a", "b"}
    # identical layouts → identical plans per partition
    a = sorted((r["group_id"], r["n_files"], r["group_bytes"]) for r in by_part["a"])
    b = sorted((r["group_id"], r["n_files"], r["group_bytes"]) for r in by_part["b"])
    assert a == b


# ---------------------------------------------------------------------------
# binary hamming ANN
# ---------------------------------------------------------------------------


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def _np_pack(X):
    """Independent numpy packing: bit j of word w = X[:, w*32+j] > 0."""
    n, dim = X.shape
    n_words = (dim + 31) // 32
    words = np.zeros((n, n_words), dtype=np.int64)
    for d in range(dim):
        words[:, d // 32] |= (X[:, d] > 0).astype(np.int64) << (d % 32)
    return words


def test_pack_sign_bits_matches_numpy(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    X = rng.standard_normal((40, 64)).astype(np.float32)
    df = _emb_df(spark, X)
    w = pack_sign_bits(F.col("embedding"), 64)
    got = (
        df.select("vec_id", w[0].alias("w0"), w[1].alias("w1"))
        .orderBy("vec_id")
        .collect()
    )
    want = _np_pack(X)
    for r in got:
        i = int(r["vec_id"])
        assert r["w0"] == int(want[i, 0]) and r["w1"] == int(want[i, 1])
        assert r["w0"] >= 0 and r["w1"] >= 0  # 32-bit words never go negative


def test_hamming_ranks_match_numpy_and_shortlist_reranks_exact(spark):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((60, 64)).astype(np.float32)
    df = _emb_df(spark, X)
    queries = df.filter("vec_id < 3")
    out = binary_hamming_topk(df, queries, dim=64, k=5, shortlist=20).collect()
    words = _np_pack(X)
    for r in out:
        q, n = int(r["query_id"]), int(r["neighbor_id"])
        ham = sum(
            bin(int(words[q, w]) ^ int(words[n, w])).count("1") for w in range(2)
        )
        assert r["hamming"] == ham
    # rerank is exact cosine over the shortlist: rank-1 neighbor must be the
    # true cosine argmax within the Hamming-top-20 candidate set
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for q in range(3):
        ham_all = np.array([
            sum(bin(int(words[q, w]) ^ int(words[n, w])).count("1") for w in range(2))
            if n != q else 10 ** 9
            for n in range(60)
        ])
        short = np.lexsort((np.arange(60), ham_all))[:20]
        best = short[np.argmax(Xn[short] @ Xn[q])]
        got1 = [r["neighbor_id"] for r in out if r["query_id"] == q and r["rank"] == 1]
        assert got1 == [int(best)]
