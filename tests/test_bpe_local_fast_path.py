"""Equivalence of the size-conditioned LOCAL trainer fast paths with the
distributed round loops (the test_graph_cc discipline): on randomized
corpora, bpe/wordpiece/unigram training with the fast path enabled must
produce byte-identical model tables AND encoded word tables to a run with
the gate disabled (SPARK_GRAFT_LOCAL_TRAIN_TYPES=0 → every round is a
distributed job, the pre-r13 behavior)."""

from __future__ import annotations

import random

import pytest

from aci_export_spark.llm import bpe as B
from aci_export_spark.llm import unigram as U
from aci_export_spark.llm import wordpiece as W


def _corpus(spark, seed: int, n_docs: int = 24):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
        for _ in range(rng.randint(4, 14))
    ]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(n_docs)
    ]
    rows.append((n_docs, None))  # NULL text must flow through both paths
    rows.append((n_docs + 1, "   "))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _words_rows(df):
    return sorted(
        (tuple(r["symbols"]), int(r["wcount"]), int(r["base_len"]))
        for r in df.collect()
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_bpe_batched_fast_path_equals_distributed(spark, seed, monkeypatch):
    docs = _corpus(spark, seed)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "0")
    m_d, w_d, r_d = B.bpe_train_batched_with_encoded(
        docs, n_merges=24, batch_cap=4
    )
    m_d_rows, w_d_rows = _rows(m_d), _words_rows(w_d)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048")
    m_f, w_f, r_f = B.bpe_train_batched_with_encoded(
        docs, n_merges=24, batch_cap=4
    )
    assert _rows(m_f) == m_d_rows
    assert _words_rows(w_f) == w_d_rows
    assert r_f == r_d
    assert m_f.schema == m_d.schema
    # downstream encode-stats consumer sees identical aggregates
    assert _rows(B.encoded_words_stats(w_f)) == _rows(
        B.encoded_words_stats(w_d)
    )


@pytest.mark.parametrize("seed", [4, 5])
def test_bpe_sequential_fast_path_equals_distributed(spark, seed, monkeypatch):
    docs = _corpus(spark, seed)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "0")
    m_d, w_d = B.bpe_train_with_encoded(docs, n_merges=8)
    m_d_rows, w_d_rows = _rows(m_d), _words_rows(w_d)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048")
    m_f, w_f = B.bpe_train_with_encoded(docs, n_merges=8)
    assert _rows(m_f) == m_d_rows
    assert _words_rows(w_f) == w_d_rows
    assert m_f.schema == m_d.schema


@pytest.mark.parametrize("seed", [6, 7])
def test_wordpiece_fast_path_equals_distributed(spark, seed, monkeypatch):
    docs = _corpus(spark, seed)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "0")
    m_d, w_d, r_d = W.wordpiece_train(docs, n_merges=16, batch_cap=4)
    m_d_rows, w_d_rows = _rows(m_d), _words_rows(w_d)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048")
    m_f, w_f, r_f = W.wordpiece_train(docs, n_merges=16, batch_cap=4)
    assert _rows(m_f) == m_d_rows
    assert _words_rows(w_f) == w_d_rows
    assert r_f == r_d
    assert m_f.schema == m_d.schema


@pytest.mark.parametrize("seed", [8, 9])
def test_unigram_fast_path_equals_distributed(spark, seed, monkeypatch):
    docs = _corpus(spark, seed)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "0")
    v_d = U.unigram_train(docs, vocab_size=10, max_piece_len=3, seed_multi=16)
    v_d_rows = _rows(v_d)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048")
    v_f = U.unigram_train(docs, vocab_size=10, max_piece_len=3, seed_multi=16)
    assert _rows(v_f) == v_d_rows
    assert v_f.schema == v_d.schema


def test_empty_corpus_fast_path(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048")
    m, w, rounds = B.bpe_train_batched_with_encoded(docs, n_merges=8)
    assert m.count() == 0 and w.count() == 0 and rounds == 0
    st = B.encoded_words_stats(w).collect()[0]
    assert (st["n_words"], st["n_base_symbols"], st["n_encoded_symbols"]) == (
        0, 0, 0,
    )
