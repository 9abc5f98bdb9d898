"""Cross-validation of the MinHash+LSH near-dup pipeline against exact
shingle-set Jaccard computed independently in Python (the check the
rows-only driver entry cannot provide)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from aci_export_spark.llm import dedup as D
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.5
SHINGLE = 5


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _shingles(text: str) -> set[str]:
    n = _norm(text)
    if len(n) <= SHINGLE:
        return {n[:SHINGLE]}
    return {n[i : i + SHINGLE] for i in range(len(n) - SHINGLE + 1)}


@pytest.fixture(scope="module")
def ground_truth(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, SF_SMOKE, "documents").collect()
    }
    sh = {i: _shingles(t) for i, t in docs.items()}
    ids = sorted(sh)
    exact = {}
    for ii, a in enumerate(ids):
        for b in ids[ii + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / len(sh[a] | sh[b])
            if j >= THRESHOLD:
                exact[(a, b)] = j
    return exact


def test_minhash_lsh_precision_and_recall(spark, ground_truth):
    docs = read_table(spark, SF_SMOKE, "documents")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", threshold=THRESHOLD,
            num_hashes=16, bands=4, shingle_size=SHINGLE,
        ).collect()
    }
    # PRECISION is exact by construction (candidates are verified with exact
    # Jaccard on hashed shingle sets): every reported pair is a true pair
    # with the same jaccard value (up to 64-bit hash collisions)
    for pair, j in got.items():
        assert pair in ground_truth, f"false positive {pair} (j={j})"
        assert j == pytest.approx(ground_truth[pair], abs=1e-12)

    # RECALL is 1.0 on this fixture (its true pairs sit at j≈0.9+, where
    # 4 bands of 4 detect w.p. ≈0.986 per pair; empirically every pair is
    # found at sf0.001 AND sf0.01). The harness oracle for
    # llm_dedup_minhash_lsh depends on this: it hash-compares the LSH output
    # against the exact all-pairs Jaccard, so any missed pair becomes a
    # driver correctness FAIL — this assertion localizes such a regression.
    assert set(got) == set(ground_truth), (
        sorted(set(ground_truth) - set(got)),
        sorted(set(got) - set(ground_truth)),
    )


def test_simhash_blocked_pairs_exact_vs_bruteforce(spark):
    """The block-partition scheme guarantees recall (pigeonhole over
    max_hamming+1 disjoint blocks) and verifies exactly, so its output must
    EQUAL the brute-force all-pairs Hamming join."""
    docs = read_table(spark, SF_SMOKE, "documents")
    hashes = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_table(docs, "doc_id", "text").collect()
    }
    ids = sorted(hashes)
    expected = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for ii, a in enumerate(ids)
        for b in ids[ii + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 8
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs_blocked(
            docs, "doc_id", "text", max_hamming=8
        ).collect()
    }
    assert got == expected


def test_simhash_blocked_pairs_60bit_production_shape(spark):
    """Same exactness at the production shape the harness query uses:
    60-bit hash, radius 3, 4 disjoint 15-bit blocks."""
    docs = read_table(spark, SF_SMOKE, "documents")
    hashes = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_table(docs, "doc_id", "text", bits=60).collect()
    }
    ids = sorted(hashes)
    expected = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for ii, a in enumerate(ids)
        for b in ids[ii + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs_blocked(
            docs, "doc_id", "text", max_hamming=3, bits=60
        ).collect()
    }
    assert got == expected


def test_simhash_blocked_rejects_bad_params(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        D.simhash_near_dup_pairs_blocked(docs, "doc_id", "text",
                                         max_hamming=8, n_blocks=8)
    with pytest.raises(ValueError):
        D.simhash_near_dup_pairs_blocked(docs, "doc_id", "text",
                                         max_hamming=40)


def test_lsh_recall_audit_matches_pure_python_replay(spark):
    """Third independent implementation: the audit's confusion counts are
    replayed in plain Python (hashlib md5, dict buckets, brute-force
    Jaccard) — catching any drift in the portable hash family, the band
    key derivation, or the confusion algebra that the Spark/DuckDB pair
    could share by construction."""
    import hashlib
    from itertools import combinations

    # 60 DISTINCT tokens -> 58 distinct 3-grams; one appended word makes a
    # 58/59-gram Jaccard ~0.983 near-dup, comfortably in truth
    base = " ".join(f"word{i:02d}" for i in range(60))
    texts = {
        1: base,
        2: base + " tailword",  # near-dup of 1 (J ~ 0.983)
        3: base,  # exact duplicate of 1
        4: "completely different content about spark catalyst plans "
           "and shuffle partitioning strategies at scale " * 3,
        5: "short doc",  # two tokens -> no 3-grams, out of scope
        6: "completely different content about spark catalyst plans "
           "and shuffle partitioning strategies at scale " * 3 + "near dup tail",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = D.lsh_recall_audit(docs, "doc_id", "text").collect()[0].asDict()

    def grams(t):
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    mask = (1 << 60) - 1
    sets = {i: grams(t) for i, t in texts.items() if grams(t)}

    def signature(s):
        hs = [hashlib.md5(g.encode()).hexdigest() for g in s]
        pairs = [(int(h[:15], 16), int(h[16:30], 16)) for h in hs]
        return [
            min((h1 + i * h2) & mask for h1, h2 in pairs) for i in range(16)
        ]

    buckets: dict = {}
    for i, s in sets.items():
        sig = signature(s)
        for b in range(4):
            key = (b, hashlib.md5(
                ",".join(str(v) for v in sig[b * 4 : b * 4 + 4]).encode()
            ).hexdigest())
            buckets.setdefault(key, set()).add(i)
    cand = {
        tuple(sorted(p))
        for members in buckets.values()
        for p in combinations(sorted(members), 2)
    }
    truth = {
        (a, b)
        for a, b in combinations(sorted(sets), 2)
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.9
    }
    assert got == {
        "n_true": len(truth),
        "n_candidates": len(cand),
        "n_found": len(truth & cand),
        "n_missed": len(truth - cand),
        "n_pruned": len(cand - truth),
    }
    assert got["n_true"] >= 2  # the planted dup + near-dup are in truth
