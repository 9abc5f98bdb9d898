"""Kneser-Ney bigram LM scoring (llm/text.py kn_bigram_scores): exact
agreement with a from-the-spec single-process reference, the short-doc
emission contract, and the smoothing property that distinguishes KN from
the raw-MLE bigram scorer."""

from __future__ import annotations

import re

from aci_export_spark.llm.text import KN_PPB_Q, kn_bigram_scores

Q = KN_PPB_Q  # 250_000_000 == 1e9 / 4


def _reference(docs: list[tuple[int, str]]):
    """Single-process KN reference: dict counts, the same two-floor ppb
    spec, shares no code with the Spark implementation."""
    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for d, t in docs
    }
    pairs: dict[int, list[tuple[str, str]]] = {
        d: list(zip(t, t[1:])) for d, t in toks.items() if len(t) >= 2
    }
    c: dict[tuple[str, str], int] = {}
    for ps in pairs.values():
        for p in ps:
            c[p] = c.get(p, 0) + 1
    c_w1: dict[str, int] = {}
    n1p_fw: dict[str, int] = {}
    n1p_bw: dict[str, int] = {}
    for (a, b), n in c.items():
        c_w1[a] = c_w1.get(a, 0) + n
        n1p_fw[a] = n1p_fw.get(a, 0) + 1
        n1p_bw[b] = n1p_bw.get(b, 0) + 1
    T = len(c)

    def ppb(a, b):
        return (max(4 * c[(a, b)] - 3, 0) * Q) // c_w1[a] + (
            3 * n1p_fw[a] * n1p_bw[b] * Q
        ) // (c_w1[a] * T)

    out = {}
    for d, ps in pairs.items():
        if not ps:
            continue
        scores = [ppb(a, b) for a, b in ps]
        out[d] = {
            "n_bigrams": len(ps),
            "sum_ppb": sum(scores),
            "min_ppb": min(scores),
            "novel_bigrams": sum(1 for p in ps if c[p] <= 1),
        }
    g_sum = sum(v["sum_ppb"] for v in out.values())
    g_n = sum(v["n_bigrams"] for v in out.values())
    for v in out.values():
        v["mean_ppb"] = v["sum_ppb"] // v["n_bigrams"]
        v["keep"] = v["mean_ppb"] >= g_sum // g_n
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat again and again"),
    (3, "the dog sat on the mat"),
    (4, "zebra quark flux"),          # all-novel transitions
    (5, "the the the the"),            # repeated high-count bigram
    (6, "single"),                     # < 2 tokens: must emit nothing
    (7, "  the   cat  "),              # whitespace normalization
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_single_process_reference(spark):
    got = {
        int(r["doc_id"]): r.asDict()
        for r in kn_bigram_scores(_df(spark)).collect()
    }
    want = _reference(DOCS)
    assert set(got) == set(want)
    for d, w in want.items():
        for k, v in w.items():
            assert got[d][k] == v, (d, k, got[d][k], v)


def test_short_docs_emit_no_row(spark):
    ids = {int(r["doc_id"]) for r in kn_bigram_scores(_df(spark)).collect()}
    assert 6 not in ids  # 1 token
    assert 7 in ids      # normalizes to 2 tokens


def test_probabilities_are_proper_and_smoothed(spark):
    """Every ppb is in (0, 1e9]; novel bigrams still get strictly positive
    mass (the continuation back-off — exactly what raw MLE denies them)."""
    rows = kn_bigram_scores(_df(spark)).collect()
    by_id = {int(r["doc_id"]): r for r in rows}
    for r in rows:
        assert 0 < r["min_ppb"] <= 4 * Q
    # doc 4 is all never-seen-elsewhere transitions: minimum must still be > 0
    assert by_id[4]["novel_bigrams"] == by_id[4]["n_bigrams"]
    assert by_id[4]["min_ppb"] > 0


def test_word_soup_scores_below_natural_repetition(spark):
    """The corpus's own frequent transitions score higher than a shuffled
    soup of the same vocabulary — the reason a bigram LM (smoothed or not)
    beats a unigram filter."""
    docs = [(i, "the cat sat on the mat") for i in range(10)] + [
        (99, "mat the on sat the cat")
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {int(r["doc_id"]): r for r in kn_bigram_scores(df).collect()}
    assert rows[0]["mean_ppb"] > rows[99]["mean_ppb"]
    assert rows[0]["keep"] and not rows[99]["keep"]
