"""bigram_lm_scores (llm/text.py): exact counts on a hand-computed corpus
and the order-sensitivity property the unigram filter lacks."""

from __future__ import annotations

from aci_export_spark.llm import text as T


def test_exact_counts_tiny_corpus(spark):
    # corpus bigrams: "a b" x3 (doc0 x2, doc1 x1), "b a" x1, "c d" x1
    rows = [(0, "a b a b"), (1, "a b"), (2, "c d")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.bigram_lm_scores(df, "doc_id", "text").collect()}
    # doc0: grams [a b, b a, a b] -> freqs [3, 1, 3] -> sum 7, novel 1
    assert got[0]["n_bigrams"] == 3 and got[0]["freq_sum"] == 7
    assert got[0]["novel_bigrams"] == 1
    # doc1: [a b] -> 3
    assert got[1]["n_bigrams"] == 1 and got[1]["freq_sum"] == 3
    assert got[1]["novel_bigrams"] == 0
    # doc2: [c d] -> 1, novel
    assert got[2]["freq_sum"] == 1 and got[2]["novel_bigrams"] == 1
    # keep: g_occ=5, g_vocab=3; doc0: 7*3 >= 3*5 True; doc2: 1*3 >= 1*5 False
    assert got[0]["keep"] is True and got[2]["keep"] is False


def test_word_soup_scores_below_natural_order(spark):
    # Ten docs share the same natural phrase; one doc has the same TOKENS
    # shuffled. Unigram stats are identical by construction; the bigram
    # filter must score the scrambled doc strictly lower.
    natural = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the fox lazy quick over brown the jumps"
    rows = [(i, natural) for i in range(10)] + [(10, scrambled)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.bigram_lm_scores(df, "doc_id", "text").collect()}
    assert got[10]["freq_sum"] < got[0]["freq_sum"]
    assert got[10]["novel_bigrams"] > got[0]["novel_bigrams"]
    assert got[0]["keep"] is True and got[10]["keep"] is False


def test_single_token_docs_emit_no_row(spark):
    df = spark.createDataFrame([(0, "solo"), (1, "two words")], ["doc_id", "text"])
    got = {r["doc_id"] for r in T.bigram_lm_scores(df, "doc_id", "text").collect()}
    assert got == {1}
