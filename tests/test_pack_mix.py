"""Unit tests for sequence packing and epoch mixing semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm import pack as P


def test_pack_assignments_contiguous_within_shard(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (10 + i))) for i in range(40)],
        "doc_id long, text string",
    )
    out = P.pack_assignments(docs, window=32, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) > 1
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["start_off"])
        # token stream is gapless: each doc starts where the previous ended
        off = 0
        for r in rows:
            assert r["start_off"] == off, (shard, r)
            assert r["first_pack"] == off // 32
            assert r["last_pack"] == (off + r["n_tokens"] - 1) // 32
            assert r["first_pack"] <= r["last_pack"]
            off += r["n_tokens"]


def test_pack_assignments_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 7)) for i in range(20)], "doc_id long, text string"
    )
    a = sorted(map(tuple, P.pack_assignments(docs, window=16).collect()))
    b = sorted(map(tuple, P.pack_assignments(docs.repartition(7), window=16).collect()))
    assert a == b  # layout independent of input partitioning


def test_weighted_epoch_mix_repeats_and_drops(spark):
    docs = spark.createDataFrame(
        [(1, "web"), (2, "wiki"), (3, "junk")], "doc_id long, source string"
    )
    weights = spark.createDataFrame(
        [("web", 1), ("wiki", 3), ("junk", 0)], "source string, weight int"
    )
    rows = P.weighted_epoch_mix(docs, weights).collect()
    got = sorted((r["doc_id"], r["epoch_copy"]) for r in rows)
    assert got == [(1, 1), (2, 1), (2, 2), (2, 3)]  # weight 0 drops doc 3
