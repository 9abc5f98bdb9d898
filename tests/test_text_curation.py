"""Unit tests for corpus-curation operators: line-level boilerplate removal
(reassembly order, frequency threshold) and decontamination pair semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm import text as T


def test_line_dedup_strips_frequent_lines_keeps_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nalpha prose one\nNAV BAR\nbeta prose two"),
            (2, "COOKIE BANNER\ngamma prose\nNAV BAR"),
            (3, "COOKIE BANNER\ndelta text\nNAV BAR\nmore delta"),
            (4, "unique only doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cleaned_text"], r["n_kept_lines"])
        for r in T.line_dedup(docs, "doc_id", "text", max_doc_freq=2).collect()
    }
    # banner + nav appear in 3 docs (> max_doc_freq=2) → stripped everywhere;
    # original line order preserved in what remains
    assert out[1] == ("alpha prose one\nbeta prose two", 2)
    assert out[2] == ("gamma prose", 1)
    assert out[3] == ("delta text\nmore delta", 2)
    assert out[4] == ("unique only doc", 1)


def test_line_dedup_drops_fully_boilerplate_docs(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, "other")],
        "doc_id long, text string",
    )
    out = T.line_dedup(docs, "doc_id", "text", max_doc_freq=2)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {4}  # docs 1-3 are 100% boilerplate → no surviving lines


def test_contamination_pairs_counts_distinct_shared_grams(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally unrelated words here")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, "quick brown fox runs far away")], "doc_id long, text string"
    )
    rows = T.contamination_pairs(train, test, n=3, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    # shared distinct 3-gram: only "quick brown fox"
    assert (r["train_doc_id"], r["test_doc_id"], r["shared_ngrams"]) == (1, 10, 1)


def test_word_ngram_rows_short_doc_and_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x y x y x")], "doc_id long, text string"
    )
    # doc 1 is shorter than n=3 → nothing; doc 2 has repeated grams
    distinct = T.word_ngram_rows(df, "doc_id", "text", n=3).collect()
    all_rows = T.word_ngram_rows(df, "doc_id", "text", n=3, distinct=False).collect()
    assert {r["doc_id"] for r in distinct} == {2}
    assert len([r for r in all_rows if r["doc_id"] == 2]) == 3  # positions 1..3
    assert len([r for r in distinct if r["doc_id"] == 2]) == 2  # "x y x", "y x y", "x y x"


def test_gopher_flags_fail_modes(spark):
    docs = spark.createDataFrame(
        [
            (1, "too short"),  # < 10 words
            (2, " ".join(["the"] + ["word"] * 20)),  # repeated 2-gram dominates
            (3, " ".join("the quick brown fox jumps over a lazy dog again".split())),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.gopher_quality_flags(docs, "doc_id", "text").collect()}
    assert not out[1]["keep"]
    assert not out[2]["keep"]  # "word word" 2-gram is ~all 2-grams
    assert out[3]["keep"]


def test_repetition_signals_fail_modes_and_short_docs(spark):
    from aci_export_spark.llm.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # one bigram repeated wall-to-wall: top-2-gram fraction 100%
            (1, "spam ham spam ham spam ham spam ham spam ham"),
            # diverse text: every n-gram unique at all sizes
            (2, "alpha bravo charlie delta echo foxtrot golf hotel"),
            # shorter than every n: zero counts, vacuously clean
            (3, "one"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}

    r1 = rows[1]
    assert r1.repetitive
    # "spam ham" occurs 5x of 9 bigram slots
    assert r1.top2_count == 5 and r1.n_2grams == 9
    # every 4-gram occurs >=2 times, so dup chars == total chars
    assert r1.dup4_chars == r1.tot4_chars > 0

    r2 = rows[2]
    assert not r2.repetitive
    assert r2.top2_count == 1 and r2.dup2_chars == 0 and r2.dup4_chars == 0
    assert r2.n_2grams == 7 and r2.n_3grams == 6 and r2.n_4grams == 5

    r3 = rows[3]
    assert not r3.repetitive
    assert r3.n_2grams == 0 and r3.tot4_chars == 0
