"""WordPiece trainer (llm/wordpiece.py): continuation-prefix semantics,
likelihood-vs-frequency ranking, Spark ≡ single-process reference on a
fixture corpus, and the batch-compatibility rule."""

from __future__ import annotations

from aci_export_spark.llm.wordpiece import (
    _wp_concat,
    _wp_select_compatible,
    wordpiece_reference_python,
    wordpiece_train,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_wp_concat_strips_continuation_prefix():
    assert _wp_concat("a", "##b") == "ab"
    assert _wp_concat("##a", "##b") == "##ab"
    assert _wp_concat("ab", "cd") == "abcd"  # defensive: bare right side


def test_alphabet_and_merge_products(spark):
    """'aaab' x n: the word-initial 'a' is a different symbol from '##a';
    products keep word-initial bareness."""
    merge_df, words, _ = wordpiece_train(
        _docs(spark, ["aaab aaab"]), n_merges=2, batch_cap=1
    )
    got = [(r["left_sym"], r["right_sym"], r["new_sym"])
           for r in merge_df.orderBy("merge_rank").collect()]
    # merge products never stack prefixes
    assert all(not n.startswith("####") for *_pair, n in got)
    # positional invariant: the word-initial symbol is always bare, every
    # later symbol always ##-prefixed — merges preserve this by
    # construction (_wp_concat strips the RIGHT side's prefix only)
    for r in words.collect():
        syms = r["symbols"]
        assert syms and not syms[0].startswith("##")
        assert all(s.startswith("##") and len(s) > 2 for s in syms[1:])


def test_likelihood_ranking_beats_raw_frequency(spark):
    """'xy' appears 3x (freqs x=3,y=3); 'pq' appears 2x but p,q are rare
    (freqs 2,2): score(p,##q)=2/4 > score(x,##y)=3/9 — WordPiece must pick
    (p,##q) first even though (x,##y) has the higher raw count."""
    merge_df, _, _ = wordpiece_train(
        _docs(spark, ["xy xy xy pq pq"]), n_merges=1, batch_cap=1
    )
    top = merge_df.orderBy("merge_rank").first()
    assert (top["left_sym"], top["right_sym"]) == ("p", "##q")
    assert top["new_sym"] == "pq"
    assert top["score"] == 2.0 / 4.0


def test_spark_equals_reference_on_fixture(tmp_path, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the slow brown bear naps under the lazy tree",
        "quick quick slow slow the the the fox bear",
    ] * 3
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"text": texts}), path)
    ref, ref_rounds = wordpiece_reference_python(
        path, n_merges=24, batch_cap=8
    )
    merge_df, _, rounds = wordpiece_train(
        spark.read.parquet(path), n_merges=24, batch_cap=8
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["new_sym"],
         r["pair_count"], r["freq_left"], r["freq_right"], r["score"])
        for r in merge_df.orderBy("merge_rank").collect()
    ]
    assert got == ref
    assert rounds == ref_rounds


def test_select_compatible_blocks_interacting_pairs():
    """A pair sharing a symbol (or a product) with an earlier selection is
    skipped: its count/frequencies may have changed mid-batch."""
    ranked = [
        ("a", "##b", 10, 20, 20),
        ("##b", "##c", 9, 20, 20),   # shares ##b -> skipped
        ("ab", "##d", 8, 20, 20),    # equals product of #1 -> skipped
        ("x", "##y", 7, 20, 20),     # disjoint -> selected
    ]
    got = _wp_select_compatible(ranked, room=4)
    assert [(l, r) for l, r, *_ in got] == [("a", "##b"), ("x", "##y")]
