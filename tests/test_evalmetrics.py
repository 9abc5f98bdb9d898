"""Generation-eval metrics (llm/evalmetrics.py): the bit-parallel LCS vs
the classic DP (two independent algorithms), hand-computed BLEU/ROUGE-N
overlap statistics, and the truncation contract."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aci_export_spark.llm.evalmetrics import (
    _lcs_bitparallel,
    lcs_reference_python,
    lcs_token_stats,
    ngram_overlap_eval,
)


# ---------------------------------------------------------------------------
# LCS: bit-parallel vs quadratic DP
# ---------------------------------------------------------------------------


def test_lcs_hand_vectors():
    cases = [
        ([], [], 0),
        (["a"], [], 0),
        ([], ["a"], 0),
        (["a", "b"], ["a", "b"], 2),
        (["a", "b"], ["b", "a"], 1),
        (["a", "b", "c"], ["a", "x", "c"], 2),
        (["a", "a"], ["a", "a"], 2),
        (["x", "a", "y", "b", "z"], ["a", "b"], 2),
        (["the", "cat", "sat"], ["the", "dog", "sat"], 2),
        # classic: ABCBDAB / BDCABA → LCS 4 (BCAB or BDAB)
        (list("abcbdab"), list("bdcaba"), 4),
    ]
    for a, b, want in cases:
        assert _lcs_bitparallel(a, b) == want, (a, b)
        assert lcs_reference_python(a, b) == want, (a, b)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from("abcd"), max_size=40),
    st.lists(st.sampled_from("abcd"), max_size=40),
)
def test_lcs_bitparallel_equals_reference(a, b):
    """The Allison–Dix sweep and the quadratic table are different
    algorithms — agreement over a small alphabet (maximizing repeats and
    ties, the hard cases for bit-parallel carries) is real evidence."""
    assert _lcs_bitparallel(a, b) == lcs_reference_python(a, b)


def test_lcs_subsequence_bounds():
    # LCS(a, a) == len(a); LCS monotone under concatenation
    a = ["w%d" % i for i in range(30)]
    assert _lcs_bitparallel(a, a) == 30
    assert _lcs_bitparallel(a, a[5:20]) == 15


# ---------------------------------------------------------------------------
# Spark paths
# ---------------------------------------------------------------------------


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, schema="pair_id long, cand_text string, ref_text string"
    )


def test_ngram_overlap_hand_computed(spark):
    # cand: "the cat the cat sat", ref: "the cat ate"
    # unigrams: cand counts {the:2, cat:2, sat:1}; ref {the:1, cat:1, ate:1}
    # clipped_1 = min(2,1)+min(2,1) = 2
    # bigrams: cand {the cat:2, cat the:1, cat sat:1}; ref {the cat:1, cat ate:1}
    # clipped_2 = 1
    df = _pairs_df(spark, [(1, "the cat the cat sat", "the cat ate")])
    r = ngram_overlap_eval(df).collect()[0].asDict()
    assert r == {
        "pair_id": 1,
        "cand_len": 5,
        "ref_len": 3,
        "cand_grams_1": 5,
        "ref_grams_1": 3,
        "clipped_1": 2,
        "cand_grams_2": 4,
        "ref_grams_2": 2,
        "clipped_2": 1,
    }


def test_ngram_overlap_disjoint_and_identical(spark):
    df = _pairs_df(
        spark,
        [(1, "a b c", "x y z"), (2, "a b c d", "a b c d")],
    )
    rows = {r["pair_id"]: r.asDict() for r in ngram_overlap_eval(df).collect()}
    assert rows[1]["clipped_1"] == 0 and rows[1]["clipped_2"] == 0
    # identical pair: clipped == gram totals (perfect precision & recall)
    assert rows[2]["clipped_1"] == 4 and rows[2]["clipped_2"] == 3


def test_ngram_overlap_short_candidate(spark):
    # 1-token candidate: zero bigrams on that side, clipped_2 = 0
    df = _pairs_df(spark, [(1, "a", "a b")])
    r = ngram_overlap_eval(df).collect()[0].asDict()
    assert r["cand_grams_2"] == 0 and r["clipped_2"] == 0
    assert r["clipped_1"] == 1


def test_lcs_token_stats_truncation_and_values(spark):
    long_a = " ".join("w%d" % i for i in range(600))
    long_b = " ".join("w%d" % i for i in range(600))
    df = _pairs_df(
        spark,
        [
            (1, "the cat sat", "the dog sat"),
            (2, long_a, long_b),
        ],
    )
    rows = {
        r["pair_id"]: r.asDict()
        for r in lcs_token_stats(df, max_tokens=512).collect()
    }
    assert rows[1] == {"pair_id": 1, "cand_len": 3, "ref_len": 3, "lcs_len": 2}
    # truncation: both sides cut at 512, identical prefixes → LCS 512
    assert rows[2] == {
        "pair_id": 2,
        "cand_len": 512,
        "ref_len": 512,
        "lcs_len": 512,
    }


def test_lcs_spark_matches_reference_on_corpus(spark):
    """Differential over real corpus texts: the Spark bit-parallel path
    reproduces the single-process quadratic reference."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = (
        docs.select(
            F.col("doc_id").alias("pair_id"),
            F.col("text").alias("cand_text"),
            F.lead("text").over(w).alias("ref_text"),
        )
        .filter(F.col("ref_text").isNotNull())
        .limit(40)
    )
    got = {
        r["pair_id"]: r["lcs_len"]
        for r in lcs_token_stats(pairs, max_tokens=512).collect()
    }
    raw = {
        r["pair_id"]: (r["cand_text"], r["ref_text"])
        for r in pairs.collect()
    }

    def toks(s):
        return " ".join(s.lower().split()).split()[:512]

    for pid, (c, r) in raw.items():
        assert got[pid] == lcs_reference_python(toks(c), toks(r)), pid


def test_lcs_empty_side_rows(spark):
    df = _pairs_df(spark, [(1, "", "a b"), (2, "a", "")])
    rows = {r["pair_id"]: r.asDict() for r in lcs_token_stats(df).collect()}
    assert rows[1]["lcs_len"] == 0 and rows[2]["lcs_len"] == 0
