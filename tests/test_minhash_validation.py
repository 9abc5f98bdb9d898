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
