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


def test_domain_quota_caps_and_prefers_longest(spark):
    rows = [(i, f"src{i % 2}", 100 + i) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = T.domain_quota(docs, "source", "doc_id", quota=3, order_col="n_chars")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["source"], []).append((r["domain_rank"], r["doc_id"]))
    # each domain capped at 3, longest docs first (ids 8,6,4 / 9,7,5)
    assert sorted(by_src["src0"]) == [(1, 8), (2, 6), (3, 4)]
    assert sorted(by_src["src1"]) == [(1, 9), (2, 7), (3, 5)]


def test_domain_quota_tie_breaks_on_id(spark):
    docs = spark.createDataFrame(
        [(3, "s", 50), (1, "s", 50), (2, "s", 50)],
        "doc_id long, source string, n_chars long",
    )
    out = T.domain_quota(docs, "source", "doc_id", quota=2, order_col="n_chars")
    got = sorted((r["domain_rank"], r["doc_id"]) for r in out.collect())
    assert got == [(1, 1), (2, 2)]  # equal length → smallest id wins


def test_unigram_lm_scores_rare_vs_common(spark):
    # "common" appears 12x across docs; "zzz"/"qqq" once each
    docs = spark.createDataFrame(
        [
            (1, "common common common common common common"),
            (2, "common common common common common common"),
            (3, "zzz qqq"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in T.unigram_lm_scores(docs).collect()}
    assert out[1]["n_tokens"] == 6 and out[1]["freq_sum"] == 6 * 12
    assert out[1]["rare_tokens"] == 0 and out[1]["keep"] is True
    # doc 3: freq_sum=2, mean 1.0 < corpus mean (14 occ / 3 vocab) → dropped
    assert out[3]["rare_tokens"] == 2 and out[3]["keep"] is False
    assert out[3]["mean_token_freq"] == 1.0


def test_bloom_no_false_negatives_and_fp_audit(spark):
    from aci_export_spark.llm import bloom as B

    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(200)], "key string"
    )
    # tiny filter → guaranteed-member hits, measurable false positives
    filt = B.bloom_build(keys, "key", m_bits=512, k_hashes=3)
    members = B.bloom_probe(keys, filt, "key", m_bits=512, k_hashes=3)
    assert all(r["maybe_member"] for r in members.collect())  # no false negatives
    others = spark.createDataFrame(
        [(f"other{i}",) for i in range(200)], "key string"
    )
    probed = B.bloom_probe(others, filt, "key", m_bits=512, k_hashes=3).collect()
    fps = sum(1 for r in probed if r["maybe_member"])
    # n=200, m=512, k=3 → theoretical fpp ≈ (1-e^(-3*200/512))^3 ≈ 0.33;
    # bound loosely — the point is "some but far from all"
    assert 0 < fps < 150
    assert all(0 <= r["n_bits_hit"] <= 3 for r in probed)


def test_bloom_union_equals_combined_build(spark):
    from aci_export_spark.llm import bloom as B

    k1 = spark.createDataFrame([(f"a{i}",) for i in range(50)], "key string")
    k2 = spark.createDataFrame([(f"b{i}",) for i in range(50)], "key string")
    merged = B.bloom_union(
        B.bloom_build(k1, "key", m_bits=512, k_hashes=3),
        B.bloom_build(k2, "key", m_bits=512, k_hashes=3),
    )
    direct = B.bloom_build(k1.unionByName(k2), "key", m_bits=512, k_hashes=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_anchor_dup_stats_planted_duplicate_span(spark):
    # doc 1 and doc 2 share an identical 80-char span starting at position 1
    # (equal anchor phase), doc 3 is unique, doc 4 is shorter than one anchor
    base = "the quick brown fox jumps over the lazy dog again and again until done "
    span = base + "x" * (80 - len(base))
    assert len(span) == 80
    rows = [
        (1, span + " tail one unique to doc1 " + "a" * 40),
        (2, span + " other tail unique here " + "b" * 40),
        (3, "completely different text with no repeats " + "c" * 60),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_anchors"], r["dup_anchors"], r["dup_char_estimate"])
        for r in T.anchor_dup_stats(df, "doc_id", "text", anchor_len=32, stride=16).collect()
    }
    # an 80-char shared span at phase 1 holds anchors at positions 1,17,33,49
    # (pos+31 <= 80) -> 4 duplicated anchors on each side
    assert got[1][1] == 4 and got[2][1] == 4
    assert got[1][2] == 64 and got[2][2] == 64
    assert got[3] == (got[3][0], 0, 0) and got[3][0] > 0
    assert got[4] == (0, 0, 0)


def test_hard_negative_topk_excludes_same_label_and_self(spark):
    from aci_export_spark.llm.similarity import hard_negative_topk

    # label 0: ids 1,2 near each other; label 1: ids 3,4; label 2: id 5 far
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.99, 0.14]),
        (3, 1, [0.98, 0.2]),
        (4, 1, [0.0, 1.0]),
        (5, 2, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 1)
    got = [
        (r["neighbor_id"], r["rank"])
        for r in hard_negative_topk(df, q, "label", k=3)
        .orderBy("rank")
        .collect()
    ]
    # id 2 (same label) and id 1 (self) excluded; hardest negative is id 3
    assert got == [(3, 1), (4, 2), (5, 3)]


def test_incremental_span_exposure_never_needs_base_text(spark):
    """The incremental path's input contract is (delta text, maintained
    index). Prove independence from base text the strong way: hand the
    operator an index of LITERAL rows — the base corpus does not exist in
    this session — and require the result to equal the full-corpus
    recompute's restriction to the delta ids."""
    from aci_export_spark.llm.dedup import (
        dup_gram_position_stats,
        gram_stats_table,
        incremental_span_exposure,
    )

    base_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta different end"),
        (3, "unrelated base words that no delta document ever repeats here"),
    ]
    delta_rows = [
        # repeats base doc 1/2's shared 8-gram prefix → dup via the index
        (10, "alpha beta gamma delta epsilon zeta eta theta closing words"),
        # duplicated only WITHIN the delta (index contributes nothing)
        (11, "mu nu xi omicron pi rho sigma tau upsilon phi"),
        (12, "mu nu xi omicron pi rho sigma tau final words"),
        # clean document: no exposure
        (13, "entirely novel text with eight plus unique tokens in sequence"),
        # short document: fewer than n words → (0, 0)
        (14, "too short"),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")
    # materialize the index to literal rows: lineage to base text is GONE
    index_rows = gram_stats_table(base, "doc_id", "text", n=8).collect()
    index = spark.createDataFrame(
        index_rows, "gram string, n_docs long, n_occurrences long"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in incremental_span_exposure(
            delta, index, "doc_id", "text", n=8, min_docs=2
        ).collect()
    }
    full = dup_gram_position_stats(
        base.unionByName(delta), "doc_id", "text", n=8, min_docs=2
    )
    want = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in full.collect()
        if r["doc_id"] >= 10
    }
    assert got == want
    # sanity on the scenario itself: index-driven dup, delta-only dup,
    # clean, and short docs all behave
    assert got[10][1] > 0 and got[11][1] > 0 and got[12][1] > 0
    assert got[13] == (got[13][0], 0) and got[13][0] > 0
    assert got[14] == (0, 0)


def test_dup_span_coverage_merges_runs_into_maximal_spans(spark):
    """k consecutive duplicated grams are ONE span of n+k-1 tokens (the
    gram-count signal reads k); disjoint duplicated regions count as
    separate spans; clean and short docs get a total (n_tokens, 0, 0)."""
    from aci_export_spark.llm.dedup import (
        dup_gram_position_stats,
        dup_span_coverage,
    )

    shared12 = "a b c d e f g h i j k l"  # 12 tokens → grams at pos 1..5
    mid8 = "m n o p q r s t"  # one shared 8-gram
    rows = [
        (1, f"{shared12} unique-one tail-one ender-one"),
        (2, f"{shared12} unique-two tail-two ender-two"),
        # doc 3: shared prefix AND a disjoint shared middle with doc 4,
        # separated by >n unique tokens so the islands cannot merge
        (3, f"{shared12} u3a u3b u3c u3d u3e u3f u3g u3h u3i {mid8} z3"),
        (4, f"v4a v4b v4c v4d v4e v4f v4g v4h v4i {mid8} w4 x4"),
        (5, "entirely unique words never repeated anywhere in this corpus at all"),
        (6, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cov = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["n_spans"])
        for r in dup_span_coverage(docs, n=8, min_docs=2).collect()
    }
    grams = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dup_gram_position_stats(docs, n=8, min_docs=2).collect()
    }
    # doc 1: grams 1..5 duplicated → one span covering tokens 1..12
    assert cov[1] == (15, 12, 1)
    assert grams[1][1] == 5  # the count signal reads 5, the mass is 12
    assert cov[2] == (15, 12, 1)
    # doc 3: prefix span (12 tokens) + the mid-8 span, 2 islands
    n3 = cov[3][0]
    assert cov[3][1:] == (12 + 8, 2)
    assert n3 == 30
    # doc 4 shares only the mid8 run with doc 3 → one 8-token span
    assert cov[4][1:] == (8, 1)
    # clean + short docs: total assignment, zero coverage
    assert cov[5] == (11, 0, 0)
    assert cov[6] == (2, 0, 0)
    # global sanity vs the gram counts: per doc, coverage is bounded by
    # n_dup_grams + 7 per island and by the doc length
    for d, (nt, ct, ns) in cov.items():
        ng, nd = grams[d]
        assert ct <= nt and ct <= nd * 8
        if nd:
            assert ct >= nd  # k gram starts cover at least k tokens
            assert ct <= nd + ns * 7  # each island adds at most n-1 tail


def test_remove_dup_spans_is_coverage_complement(spark):
    """Removal must delete EXACTLY the covered positions: per doc,
    n_tokens - n_kept_tokens == covered_tokens from dup_span_coverage;
    clean docs round-trip their normalized text; identical docs (fully
    covered) come back empty."""
    from aci_export_spark.llm.dedup import dup_span_coverage, remove_dup_spans

    shared12 = "a b c d e f g h i j k l"
    rows = [
        (1, f"{shared12} keep-one keep-two keep-three"),
        (2, f"{shared12} other-one other-two other-three"),
        (3, "Fully  Duplicated Document here with EIGHT tokens exactly"),
        (4, "fully duplicated document here with eight tokens exactly"),
        (5, "a clean document with no duplicated grams anywhere at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = {
        r["doc_id"]: (r["n_tokens"], r["n_kept_tokens"], r["cleaned_text"])
        for r in remove_dup_spans(docs, n=8, min_docs=2).collect()
    }
    cov = {
        r["doc_id"]: r["covered_tokens"]
        for r in dup_span_coverage(docs, n=8, min_docs=2).collect()
    }
    for d in cleaned:
        nt, nk, _txt = cleaned[d]
        assert nt - nk == cov[d], (d, cleaned[d], cov[d])
    # doc 1: the 12-token shared prefix goes, the private tail stays
    assert cleaned[1][2] == "keep-one keep-two keep-three"
    # docs 3/4 normalize to identical 8-token texts → fully removed
    assert cleaned[3] == (8, 0, "")
    assert cleaned[4] == (8, 0, "")
    # clean doc: normalized round-trip
    assert cleaned[5][2] == rows[4][1]
