"""Kneser-Ney TRIGRAM LM scoring (llm/text.py kn_trigram_scores): exact
agreement with a from-the-spec single-process reference on a word-soup
corpus, the short-doc emission contract, and the continuation-count
smoothing property (a trigram seen in many left contexts outranks one of
the same raw count seen in a single context)."""

from __future__ import annotations

import random
import re

from aci_export_spark.llm.text import KN_PPB_Q, kn_trigram_scores

Q = KN_PPB_Q  # 250_000_000 == 1e9 / 4


def _reference(docs: list[tuple[int, str]]):
    """Single-process interpolated-KN trigram reference: dict counts and
    the same nested-floor ppb spec, sharing no code with the Spark
    implementation."""
    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        for d, t in docs
    }
    occ: dict[int, list[tuple[str, str, str]]] = {
        d: list(zip(t, t[1:], t[2:])) for d, t in toks.items() if len(t) >= 3
    }
    c3: dict[tuple[str, str, str], int] = {}
    for ts in occ.values():
        for tr in ts:
            c3[tr] = c3.get(tr, 0) + 1
    c12: dict[tuple[str, str], int] = {}
    n1p_12: dict[tuple[str, str], int] = {}
    cont: dict[tuple[str, str], int] = {}
    for (a, b, cw), n in c3.items():
        c12[(a, b)] = c12.get((a, b), 0) + n
        n1p_12[(a, b)] = n1p_12.get((a, b), 0) + 1
        cont[(b, cw)] = cont.get((b, cw), 0) + 1
    n_mid: dict[str, int] = {}
    n1p_fw2: dict[str, int] = {}
    n1p_bw3: dict[str, int] = {}
    for (b, cw), n in cont.items():
        n_mid[b] = n_mid.get(b, 0) + n
        n1p_fw2[b] = n1p_fw2.get(b, 0) + 1
        n1p_bw3[cw] = n1p_bw3.get(cw, 0) + 1
    T = len(cont)

    def ppb(a, b, cw):
        p1 = (n1p_bw3[cw] * 1_000_000_000) // T
        p2 = (max(4 * cont[(b, cw)] - 3, 0) * Q) // n_mid[b] + (
            3 * n1p_fw2[b] * p1
        ) // (4 * n_mid[b])
        return (max(4 * c3[(a, b, cw)] - 3, 0) * Q) // c12[(a, b)] + (
            3 * n1p_12[(a, b)] * p2
        ) // (4 * c12[(a, b)])

    out = {}
    for d, ts in occ.items():
        if not ts:
            continue
        scores = [ppb(*tr) for tr in ts]
        out[d] = {
            "n_trigrams": len(ts),
            "sum_ppb": sum(scores),
            "min_ppb": min(scores),
            "novel_trigrams": sum(1 for tr in ts if c3[tr] <= 1),
        }
    g_sum = sum(v["sum_ppb"] for v in out.values())
    g_n = sum(v["n_trigrams"] for v in out.values())
    for v in out.values():
        v["mean_ppb"] = v["sum_ppb"] // v["n_trigrams"]
        v["keep"] = v["mean_ppb"] >= g_sum // g_n
    return out


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat again and again and again"),
    (3, "the dog sat on the mat"),
    (4, "zebra quark flux gluon"),      # all-novel transitions
    (5, "the the the the the"),          # repeated high-count trigram
    (6, "two words"),                    # < 3 tokens: must emit nothing
    (7, "  the   cat   sat "),           # whitespace normalization
]


def _collect(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        int(r["doc_id"]): r.asDict() for r in kn_trigram_scores(df).collect()
    }


def test_matches_single_process_reference(spark):
    got = _collect(spark, DOCS)
    want = _reference(DOCS)
    assert set(got) == set(want)  # doc 6 emits nothing on BOTH sides
    for d, w in want.items():
        for k, v in w.items():
            assert got[d][k] == v, (d, k, got[d][k], v)


def test_word_soup_differential(spark):
    """500 random word-soup docs over a tiny vocabulary (dense trigram
    collisions, heavy ties): every output integer must match the
    reference exactly — the fuzz that catches any divergence between the
    nested-floor renderings."""
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(500)
    ]
    got = _collect(spark, docs)
    want = _reference(docs)
    assert set(got) == set(want)
    for d, w in want.items():
        for k, v in w.items():
            assert got[d][k] == v, (d, k, got[d][k], v)


def test_continuation_count_smoothing(spark):
    """The KN property: among unseen-context predictions, a word observed
    after MANY distinct middles (high N1+(.w3)) gets a higher backoff
    mass than an equal-raw-count word seen in one context."""
    docs = [
        # 'promiscuous' as w3 after THREE distinct middles
        (1, "x1 m1 promiscuous"),
        (2, "x2 m2 promiscuous"),
        (3, "x3 m3 promiscuous"),
        # 'niche' as w3 three times but always after the SAME middle
        (4, "y1 mm niche"),
        (5, "y2 mm niche"),
        (6, "y3 mm niche"),
        (7, "probe probe promiscuous"),
        (8, "probe probe niche"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scores = {
        (r["doc_id"]): r["sum_ppb"] for r in kn_trigram_scores(df).collect()
    }
    # docs 7/8 carry one trigram each with identical raw count (1) and
    # identical (w1, w2) statistics; 'promiscuous' has more distinct
    # continuation predecessors (4 vs 2), so KN must rank doc 7 above 8
    assert scores[7] > scores[8]
