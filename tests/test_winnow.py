"""Winnowing fingerprints (llm/winnow.py) vs a brute-force pure-Python
replay of Schleimer et al. SIGMOD'03, plus the paper's two contracts:
the detection guarantee (any shared substring of length >= w+k-1 yields a
shared fingerprint) and the rightmost-min tie-break."""

from __future__ import annotations

import hashlib
import math
import re

import pyspark.sql.functions as F

from aci_export_spark.llm import winnow as W


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _h32(gram: str) -> int:
    return int(hashlib.md5(("win:" + gram).encode()).hexdigest()[:8], 16)


def _winnow_py(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Brute-force reference: for every full window of w consecutive gram
    hashes select (pos, hash) of the min hash, rightmost on ties."""
    s = _norm(text)
    hs = [(_h32(s[i : i + k]), i) for i in range(len(s) - k + 1)]
    out: set[tuple[int, int]] = set()
    for start in range(len(hs) - w + 1):
        window = hs[start : start + w]
        mh = min(h for h, _ in window)
        pos = max(p for h, p in window if h == mh)
        out.add((pos, mh))
    return out


def _spark_fps(spark, rows, k=8, w=4):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = W.winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    return by_doc


def test_matches_bruteforce_reference(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog near the river bank today",
        "Winnowing  selects   a minimal set of hashes per sliding window",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # constant-hash tie-break stress
        "short",  # below k -> no grams
        "exactly twelve c",  # k <= len < k+w-1 -> grams but no full window
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    by_doc = _spark_fps(spark, rows, k=8, w=4)
    for i, t in enumerate(texts):
        assert by_doc.get(i, set()) == _winnow_py(t, 8, 4), f"doc {i}"


def test_detection_guarantee(spark):
    # Shared substring of exactly w+k-1 = 11 normalized chars (k=8, w=4)
    # embedded in otherwise-unrelated text must produce a shared fp hash.
    shared = "zqxjkwvbnmp"  # 11 chars
    rows = [
        (0, f"left padding text {shared} first document trailer"),
        (1, f"completely different preamble {shared} other ending words"),
    ]
    by_doc = _spark_fps(spark, rows, k=8, w=4)
    h0 = {h for _, h in by_doc[0]}
    h1 = {h for _, h in by_doc[1]}
    assert h0 & h1, "guaranteed-detectable shared substring missed"


def test_rightmost_tie_break_constant_text(spark):
    # All grams of a constant string hash identically, so every window's
    # min is that hash and the RIGHTMOST position wins: selected positions
    # are exactly w-1 .. len-k, i.e. n_fingerprints == n_windows.
    text = "b" * 40
    k, w = 8, 4
    by_doc = _spark_fps(spark, [(0, text)], k=k, w=w)
    positions = sorted(p for p, _ in by_doc[0])
    assert positions == list(range(w - 1, len(text) - k + 1))


def test_stats_density_and_zero_fill(spark):
    rows = [
        (0, "the winnowing density of a long enough random-ish text settles "
            "near two over w plus one as the paper proves for random hashes"),
        (1, "tiny"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stats = {r["doc_id"]: r for r in W.winnow_stats(df, "doc_id", "text", k=8, w=4).collect()}
    long_doc = stats[0]
    # hard bounds: each selection covers at most w windows; every full
    # window selects something
    assert long_doc["n_fingerprints"] >= math.ceil(long_doc["n_windows"] / 4)
    assert long_doc["n_fingerprints"] <= long_doc["n_windows"]
    # short doc appears zero-filled, not dropped
    assert stats[1]["n_grams"] == 0
    assert stats[1]["n_fingerprints"] == 0


def test_overlap_pairs_finds_heavy_overlap_only(spark):
    dup = ("an identical long passage that the two twin documents both "
           "contain verbatim from start to finish with many characters")
    rows = [
        (0, "unique alpha text " + dup),
        (1, "unique beta prose " + dup),
        (2, "zz qq jj xx kk ww vv pp gg hh yy uu oo ii ee aa ss dd ff ll "
            "rr tt nn mm bb cc zq qj jx xk kw wv vp pg gh hy yu uo oi ie"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in W.winnow_overlap_pairs(
            df, "doc_id", "text", k=8, w=4, min_shared=2, max_df=50
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p for p in pairs), "unrelated doc paired"


def test_too_long_document_raises(spark):
    from py4j.protocol import Py4JJavaError
    import pytest

    df = spark.createDataFrame([(0, "x" * (W.POS_SPACE + 5))], ["doc_id", "text"])
    with pytest.raises(Exception) as ei:
        W.winnow_fingerprints(df, "doc_id", "text").collect()
    assert "POS_SPACE" in str(ei.value)


def test_containment_statistics(spark):
    # doc 1's content is a strict subset of doc 0's -> containment of the
    # smaller side should be near 1 (every selected fp of 1 also in 0),
    # and n_shared <= min(n_fp_a, n_fp_b) always.
    base = ("a long shared passage with plenty of distinct characters to "
            "select several winnowed fingerprints from reliably")
    rows = [
        (0, base + " plus an extra unique tail only doc zero carries here"),
        (1, base),
        (2, "totally different text qq ww ee rr tt yy uu ii oo pp aa ss dd"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r
    for r in W.winnow_containment(
            df, "doc_id", "text", k=8, w=4, min_shared=2, max_df=50
        ).collect()
    }
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["n_shared"] <= min(r["n_fp_a"], r["n_fp_b"])
    # the subset doc's containment: shared / n_fp_b >= 0.8
    assert r["n_shared"] * 5 >= r["n_fp_b"] * 4
    assert not any(2 in p for p in got)


def test_null_text_rows_emit_nothing_not_error(spark):
    # review finding (r9): the POS_SPACE guard was inverted — NULL text fell
    # into the raise branch and aborted the job. NULL rows must flow through
    # as gram-less documents like every other text operator.
    df = spark.createDataFrame(
        [(0, "a perfectly ordinary document body"), (1, None)],
        "doc_id long, text string",
    )
    got = W.winnow_fingerprints(df, "doc_id", "text", k=8, w=4).collect()
    assert {r["doc_id"] for r in got} == {0}
    stats = {r["doc_id"]: r for r in W.winnow_stats(df, "doc_id", "text", k=8, w=4).collect()}
    assert stats[1]["n_fingerprints"] == 0
