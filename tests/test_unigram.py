"""Unigram-LM tokenizer trainer: property + differential tests.

- Viterbi optimality: the DP's segmentation probability equals the max
  over ALL brute-force-enumerated segmentations (exact rationals).
- Executor DP ≡ reference DP (iterative vs memoized-recursive realization
  of the same comparison contract).
- Spark trainer ≡ single-process reference trainer on in-memory corpora
  (the golden-oracle guarantee, exercised beyond the fixture corpus).
- Laplace bridging: characters absent from the vocabulary still segment.
- Fertility rows match the reference fold.
"""

from __future__ import annotations

import itertools
from fractions import Fraction

import pytest

from aci_export_spark.llm.unigram import (
    _ref_viterbi,
    seed_vocab,
    substring_counts,
    unigram_fertility_by_lang,
    unigram_reference_fertility,
    unigram_reference_python,
    unigram_train,
    viterbi_segment,
    word_type_table,
)


def _brute_best_prob(word, scores, total, max_len):
    """Max segmentation probability by enumerating every split."""
    best = Fraction(0)
    n = len(word)
    for bits in itertools.product([0, 1], repeat=max(0, n - 1)):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        if any(len(p) > 1 and p not in scores for p in pieces):
            continue
        prob = Fraction(1)
        for p in pieces:
            prob *= Fraction(scores.get(p, 0) + 1, total)
        best = max(best, prob)
    return best


def _seg_prob(pieces, scores, total):
    prob = Fraction(1)
    for p in pieces:
        prob *= Fraction(scores.get(p, 0) + 1, total)
    return prob


@pytest.mark.parametrize("word", ["banana", "abcabc", "aaaa", "xyzzy", "q"])
def test_viterbi_matches_bruteforce(word):
    scores = {"a": 10, "b": 4, "n": 6, "c": 2, "an": 9, "ana": 7, "bc": 5,
              "ab": 3, "x": 1, "y": 1, "z": 2, "zz": 8, "q": 1, "na": 2}
    total = sum(scores.values()) + len(scores)
    seg = viterbi_segment(word, scores, total, max_piece_len=3)
    assert "".join(seg) == word
    assert _seg_prob(seg, scores, total) == _brute_best_prob(
        word, scores, total, 3
    )


@pytest.mark.parametrize(
    "word", ["banana", "mississippi", "aaaaaaaa", "tokenizer", "zz"]
)
def test_iterative_and_memoized_dp_agree(word):
    scores = {"a": 3, "na": 3, "an": 3, "ban": 2, "iss": 5, "i": 2, "s": 1,
              "p": 1, "to": 4, "ken": 4, "ize": 4, "r": 1, "zz": 9, "z": 4}
    total = sum(scores.values()) + len(scores)
    assert viterbi_segment(word, scores, total, 3) == _ref_viterbi(
        word, scores, total, 3
    )


def test_laplace_bridges_unknown_chars():
    scores = {"a": 5, "ab": 3}
    total = sum(scores.values()) + len(scores)
    seg = viterbi_segment("ab!?", scores, total, 2)
    assert "".join(seg) == "ab!?"
    assert seg[-2:] == ["!", "?"]


def test_substring_counts_bruteforce(spark):
    docs = spark.createDataFrame(
        [(1, "abc ab abc"), (2, "bc a")], ["doc_id", "text"]
    )
    words = word_type_table(docs, "text")
    got = {
        r["piece"]: r["scount"]
        for r in substring_counts(words, max_piece_len=2).collect()
    }
    # word types: abc x2, ab x1, bc x1, a x1
    # substrings of abc (w=2): a,b,c,ab,bc -> each 2; ab: a,b,ab; bc: b,c,bc; a: a
    assert got == {
        "a": 2 + 1 + 1, "b": 2 + 1 + 1, "c": 2 + 1,
        "ab": 2 + 1, "bc": 2 + 1,
    }


def test_seed_vocab_keeps_all_chars_and_topk(spark):
    docs = spark.createDataFrame([(1, "abab cd cd cd")], ["doc_id", "text"])
    words = word_type_table(docs, "text")
    seed = seed_vocab(words, max_piece_len=2, seed_multi=1)
    assert {p for p in seed if len(p) == 1} == {"a", "b", "c", "d"}
    assert [p for p in seed if len(p) > 1] == ["cd"]  # 3 beats ab/ba


def test_spark_trainer_matches_reference(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "the tokenizer splits the words",
        "the words split the tokenizer",
        "split split split the the the",
        "tokenizer tokenizer words words",
    ] * 3
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}), path
    )
    docs = spark.read.parquet(path)
    got = [
        (r["piece"], r["usage_count"], r["is_char"], r["rank"])
        for r in unigram_train(
            docs, vocab_size=6, max_piece_len=3, seed_multi=12
        ).collect()
    ]
    want = unigram_reference_python(
        path, vocab_size=6, max_piece_len=3, seed_multi=12
    )
    assert sorted(got) == sorted(want)
    # deterministic: rank is a 1..N permutation ordered by (usage desc, piece)
    ranks = sorted(r for _, _, _, r in got)
    assert ranks == list(range(1, len(got) + 1))


def test_fertility_matches_reference(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        ("en", "the cat sat on the mat"),
        ("en", "the mat sat on the cat"),
        ("de", "die katze sass auf der matte"),
        ("de", "die matte die katze"),
    ]
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(rows))),
                "lang": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        path,
    )
    docs = spark.read.parquet(path)
    scores = {
        (p): c
        for p, c, _, _ in unigram_reference_python(
            path, vocab_size=5, max_piece_len=3, seed_multi=10
        )
    }
    got = {
        r["lang"]: (r["n_words"], r["n_chars"], r["n_pieces"])
        for r in unigram_fertility_by_lang(
            docs, scores, max_piece_len=3
        ).collect()
    }
    want = {
        lg: (nw, nc, np)
        for lg, nw, nc, np in unigram_reference_fertility(
            path, vocab_size=5, max_piece_len=3, seed_multi=10
        )
    }
    assert got == want
    fert = {
        r["lang"]: r["fertility"]
        for r in unigram_fertility_by_lang(docs, scores, max_piece_len=3).collect()
    }
    for lg, (nw, _, np) in want.items():
        assert fert[lg] == pytest.approx(np / nw)
