"""BPE trainer validation: greedy/overlap semantics, early stop, encode
path, and equivalence with the single-process reference trainer."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm import bpe as B
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_merge_fold_is_left_to_right_non_overlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "</w>"],)], schema="symbols array<string>"
    )
    out = df.select(F.expr(B._merge_fold_sql("a", "a")).alias("s")).collect()[0]["s"]
    # greedy left-to-right: "aaa" → [aa, a], never [a, aa]
    assert out == ["aa", "a", "</w>"]


def test_merge_fold_quotes_are_escaped(spark):
    df = spark.createDataFrame([(["don", "'", "t"],)], schema="symbols array<string>")
    out = df.select(F.expr(B._merge_fold_sql("'", "t")).alias("s")).collect()[0]["s"]
    assert out == ["don", "'t"]


def test_merge_fold_backslashes_are_escaped(spark):
    # Spark parses backslash escapes inside string literals (unknown escapes
    # like \b silently drop the backslash), so an unescaped symbol literal
    # would never match the actual array value and the fold would skip the
    # merge (the round-5 ADVICE finding).
    df = spark.createDataFrame(
        [(["a\\b", "c", "a\\b", "c"],)], schema="symbols array<string>"
    )
    out = df.select(F.expr(B._merge_fold_sql("a\\b", "c")).alias("s")).collect()[0][
        "s"
    ]
    assert out == ["a\\bc", "a\\bc"]


def test_bpe_train_matches_reference_on_backslash_corpus(spark):
    text = "x\\y x\\y x\\y zz"
    docs = spark.createDataFrame([(text,)], schema="text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in B.bpe_train(docs, n_merges=4).collect()
    ]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "docs.parquet")
        spark.createDataFrame([(text,)], schema="text string").write.parquet(p)
        want = B.bpe_reference_python(p, n_merges=4)
    assert got == want
    # the learned merges must actually involve the backslash-bearing symbols
    assert any("\\" in left or "\\" in right for _, left, right, _ in got)


def test_bpe_train_known_tiny_corpus(spark):
    # hand-checkable: "low low lower" → most frequent pair is (l, o) ×3
    docs = spark.createDataFrame([("low low lower",)], schema="text string")
    rows = B.bpe_train(docs, n_merges=2).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"], rows[0]["pair_count"]) == (
        "l",
        "o",
        3,
    )
    # after merging "lo", the next most frequent is (lo, w) ×3
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == (
        "lo",
        "w",
        3,
    )


def test_bpe_train_stops_when_no_pairs_remain(spark):
    # one single-char word: round 1 merges (a, </w>), round 2 finds nothing
    docs = spark.createDataFrame([("a a a",)], schema="text string")
    rows = B.bpe_train(docs, n_merges=5).collect()
    assert len(rows) == 1
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", B.EOW)


def test_bpe_train_empty_corpus(spark):
    docs = spark.createDataFrame([("   ",), ("",)], schema="text string")
    assert B.bpe_train(docs, n_merges=3).count() == 0


def test_bpe_matches_reference_on_fixture(spark):
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in B.bpe_train(
            read_table(spark, SF_SMOKE, "documents"), n_merges=8
        ).collect()
    ]
    want = B.bpe_reference_python(f"{SF_SMOKE}/documents.parquet", n_merges=8)
    assert got == want


def test_bpe_encode_expr_applies_merges_in_order(spark):
    docs = spark.createDataFrame([("low low lower",)], schema="text string")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in B.bpe_train(docs, n_merges=3).collect()
    ]
    word = spark.createDataFrame([(["l", "o", "w", "e", "r", "</w>"],)],
                                 schema="symbols array<string>")
    enc = word.select(F.expr(B.bpe_encode_expr(merges)).alias("s")).collect()[0]["s"]
    # merges learned: (l,o) → (lo,w) → (low,</w>); "lower" encodes with the
    # first two applied and the third blocked by the intervening "e"
    assert enc[0] == "low"
    assert "".join(enc) == "lower</w>"


def test_bpe_encode_stats_matches_reference(spark):
    from tests.conftest import SF_SMOKE

    got = B.bpe_encode_stats(
        read_table(spark, SF_SMOKE, "documents"), n_merges=8
    ).collect()[0]
    want = B.bpe_reference_encode_stats(
        f"{SF_SMOKE}/documents.parquet", n_merges=8
    )
    assert (got["n_words"], got["n_base_symbols"], got["n_encoded_symbols"]) == want
    # encoding can only shrink (merges concatenate adjacent symbols)
    assert got["n_encoded_symbols"] <= got["n_base_symbols"]
    assert got["n_words"] <= got["n_encoded_symbols"]  # >= 1 symbol per word


def test_bpe_encode_stats_empty_corpus(spark):
    docs = spark.createDataFrame([("   ",)], schema="text string")
    row = B.bpe_encode_stats(docs, n_merges=3).collect()[0]
    assert tuple(row) == (0, 0, 0)


def test_bpe_fertility_by_lang_matches_reference(spark):
    from aci_export_spark.harness_llm import llm_bpe_fertility_by_lang

    got = {
        r["lang"]: (
            r["n_words"], r["n_base_symbols"], r["n_encoded_symbols"],
            r["fertility"],
        )
        for r in llm_bpe_fertility_by_lang(spark, SF_SMOKE).collect()
    }
    want = {
        lang: (w, b, e, f)
        for lang, w, b, e, f in B.bpe_reference_fertility_by_lang(
            f"{SF_SMOKE}/documents.parquet", n_merges=8
        )
    }
    assert got == want
    assert len(got) >= 2  # the fixture is multilingual
    # fertility >= 1 always (a word encodes to >= 1 symbol)
    assert all(f >= 1.0 for *_s, f in got.values())


# ---------------------------------------------------------------------------
# batched trainer (round-7: realistic merge counts, sublinear round trips)
# ---------------------------------------------------------------------------


def test_bpe_batched_cap1_equals_sequential(spark):
    """batch_cap=1 IS classic greedy BPE: the batched spec degenerates to
    rank-1-per-round, so the merge tables must be identical."""
    docs = read_table(spark, SF_SMOKE, "documents")
    seq = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in B.bpe_train(docs, n_merges=12).collect()
    ]
    mdf, _words, rounds = B.bpe_train_batched_with_encoded(
        docs, n_merges=12, batch_cap=1
    )
    bat = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in mdf.collect()
    ]
    assert bat == seq
    assert rounds == len(seq)


def test_bpe_batched_matches_reference_and_rounds_sublinear(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    mdf, words, rounds = B.bpe_train_batched_with_encoded(
        docs, n_merges=256, batch_cap=32
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in mdf.collect()
    ]
    want, ref_rounds = B.bpe_reference_python_batched(
        f"{SF_SMOKE}/documents.parquet", n_merges=256, batch_cap=32
    )
    assert got == want
    assert rounds == ref_rounds
    # the whole point: driver round trips sublinear in merges (the
    # sequential trainer would have done len(got) collects)
    assert len(got) > 0
    assert rounds <= max(1, len(got) // 2)
    # the encoded word table reflects all merges: no adjacent pair that was
    # merged can survive in any word's symbol sequence... spot-check via
    # stats instead (full-merge saturation on the bounded vocabulary)
    stats = B.encoded_words_stats(words).collect()[0]
    assert stats["n_encoded_symbols"] <= stats["n_base_symbols"]


def test_bpe_batched_selection_is_non_interacting():
    ranked = [
        ("a", "b", 100),  # selected
        ("b", "c", 90),   # shares b -> skipped
        ("c", "d", 80),   # selected
        ("ab", "x", 70),  # consumes the mid-batch product "ab" -> skipped
        ("e", "f", 60),   # selected
        ("e", "e", 50),   # shares e -> skipped
        ("g", "g", 40),   # selected (self-pair, interacts with nothing)
    ]
    sel = B._select_compatible(ranked, 10)
    assert sel == [("a", "b", 100), ("c", "d", 80), ("e", "f", 60), ("g", "g", 40)]
    # room cap respected
    assert B._select_compatible(ranked, 2) == [("a", "b", 100), ("c", "d", 80)]


def test_bpe_batched_fold_applies_batch_in_rank_order(spark):
    """The data-driven fold applies merges sequentially in rank order
    within one expression: (a,b) then (x,y) over 'a b x y' leaves
    ['ab','xy'] and over 'b a b' only the second (a,b) site merges."""
    df = spark.createDataFrame(
        [(["a", "b", "x", "y"],), (["b", "a", "b", "x"],)],
        schema="symbols array<string>",
    )
    sql = B._batch_fold_sql([("a", "b", 0), ("x", "y", 0)])
    out = [r["s"] for r in df.select(F.expr(sql).alias("s")).collect()]
    assert out == [["ab", "xy"], ["b", "ab", "x"]]


def test_bpe_batched_encode_stats_matches_reference(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    _mdf, words, _rounds = B.bpe_train_batched_with_encoded(
        docs, n_merges=256, batch_cap=32
    )
    got = B.encoded_words_stats(words).collect()[0]
    n_words, n_base, n_enc = B.bpe_reference_batched_encode_stats(
        f"{SF_SMOKE}/documents.parquet", n_merges=256, batch_cap=32
    )
    assert (got["n_words"], got["n_base_symbols"], got["n_encoded_symbols"]) == (
        n_words, n_base, n_enc,
    )
    # the full vocabulary compresses strictly better than no merges
    assert n_enc < n_base
