"""Passage chunking (llm/text.py chunk_passages): coverage, overlap,
tail-truncation, and cross-doc chunk dedup."""

from __future__ import annotations

from aci_export_spark.llm import text as T


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_chunk_layout_and_coverage(spark):
    # 150 tokens, C=64, S=48 -> starts 1, 49, 97, 145
    df = spark.createDataFrame([(0, _words(150))], ["doc_id", "text"])
    rows = sorted(
        T.chunk_passages(df, "doc_id", "text", 64, 48).collect(),
        key=lambda r: r["start_tok"],
    )
    assert [r["start_tok"] for r in rows] == [1, 49, 97, 145]
    assert [r["chunk_no"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 54, 6]
    # coverage: last token index reached = 145 + 6 - 1 = 150
    assert rows[-1]["start_tok"] + rows[-1]["n_chunk_tokens"] - 1 == 150


def test_single_short_doc_one_chunk(spark):
    df = spark.createDataFrame([(0, _words(10))], ["doc_id", "text"])
    rows = T.chunk_passages(df, "doc_id", "text", 64, 48).collect()
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 10 and rows[0]["chunk_no"] == 0


def test_identical_chunks_hash_equal_across_docs(spark):
    body = _words(64, "same")
    df = spark.createDataFrame(
        [(0, body), (1, body), (2, _words(64, "other"))], ["doc_id", "text"]
    )
    # a 64-token doc chunks at starts [1, 49] (full chunk + 16-token tail),
    # both shared verbatim between docs 0 and 1
    dups = T.chunk_dedup_stats(df, "doc_id", "text", 64, 48).collect()
    assert len(dups) == 2
    assert all(d["n_docs"] == 2 and d["n_occurrences"] == 2 for d in dups)


def test_overlap_region_tokens_shared(spark):
    # chunk k starts at 1+48k; tokens 49..64 of chunk 0 reappear as tokens
    # 1..16 of chunk 1 — verify via hashes of the overlapping slices
    words = [f"t{i}" for i in range(1, 113)]  # 112 tokens -> starts 1, 49, 97
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        T.chunk_passages(df, "doc_id", "text", 64, 48).collect(),
        key=lambda r: r["start_tok"],
    )
    assert len(rows) == 3
    import hashlib

    c0 = " ".join(words[0:64])
    assert rows[0]["chunk_hash"] == hashlib.md5(c0.encode()).hexdigest()
    c1 = " ".join(words[48:112])
    assert rows[1]["chunk_hash"] == hashlib.md5(c1.encode()).hexdigest()


def test_empty_docs_emit_no_phantom_chunk(spark):
    # review finding (r9): split('') = [''] produced a 1-token chunk hashing
    # to md5(''), so two empty docs read as a duplicated passage.
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "real words here")], ["doc_id", "text"]
    )
    rows = T.chunk_passages(df, "doc_id", "text", 64, 48).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert T.chunk_dedup_stats(df, "doc_id", "text", 64, 48).count() == 0


def test_empty_doc_readability_zeroes(spark):
    got = {r["doc_id"]: r for r in T.readability_profile(
        spark.createDataFrame([(0, ""), (1, "two words")], ["doc_id", "text"]),
        "doc_id", "text").collect()}
    assert got[0]["n_words"] == 0 and got[0]["n_syllables"] == 0
    assert got[0]["avg_syllables_per_word"] is None
    assert got[1]["n_words"] == 2
