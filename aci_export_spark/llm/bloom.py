"""Distributed Bloom-filter build + probe for corpus membership.

The 100 TB incremental-ingest pre-filter: before a delta batch pays the full
near-dup machinery, probe a Bloom filter of the corpus's content
fingerprints — definite-misses (the overwhelming majority of genuinely new
documents) skip candidate generation entirely; only possible-members go on
to exact verification. False positives cost a wasted verify, never a wrong
answer.

Everything is deterministic and engine-portable: the k bit positions per key
are md5-derived (`llm.hashing.hash64` semantics), and the filter itself is a
relational bitmap — one row per 63-bit word, built with `bit_or` aggregation
— so a DuckDB oracle can rebuild the identical filter and replay every probe
bit-for-bit. No driver-side state, no UDFs, no sketch objects: the filter IS
a (word_idx, word) DataFrame, which also means it unions, persists to
parquet, and broadcasts like any other dimension table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.llm.hashing import hash64

#: bits per bitmap word — 63 keeps the sign bit clear so masks are positive
#: BIGINTs in every engine (DuckDB range-checks a 64th-bit shift)
WORD_BITS = 63


def _word_mask() -> Column:
    """Single-bit mask for the exploded position column ``__pos`` (expr-built:
    pyspark's `shiftleft` only takes a literal shift amount)."""
    return F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {WORD_BITS} AS INT))")


def _bit_positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """array<long> of the `k_hashes` bit positions for a key: independent
    salted 60-bit md5 hashes reduced mod the filter width."""
    return F.array(
        *[hash64(key, f"bloom{i}:") % m_bits for i in range(k_hashes)]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Build the Bloom bitmap: one row per word that has any bit set —
    `(word_idx long, word long)`. Words hold 63 bits, not 64: the sign bit
    stays clear so every mask is a positive BIGINT in any engine (DuckDB
    range-checks `1::BIGINT << 63`).

    Plan: explode each key to its k bit positions, groupBy the word index,
    OR the single-bit masks together (`bit_or` — map-side partial
    aggregation, so the shuffle carries at most `m_bits/63` rows per task
    regardless of corpus size). Sizing follows the standard calculus
    (m ≈ -n·ln(p)/ln(2)², k ≈ m/n·ln2); at 10⁹ keys and 1% fpp the bitmap
    is ~1.2 GB — still a broadcastable dimension, and probes stay a
    broadcast join against it.
    """
    pos = (
        keys.select(
            F.explode(
                _bit_positions(F.col(key_col), m_bits, k_hashes)
            ).alias("__pos")
        )
        .select(
            (F.col("__pos") / WORD_BITS).cast("long").alias("word_idx"),
            _word_mask().alias("__mask"),
        )
    )
    return pos.groupBy("word_idx").agg(F.bit_or("__mask").alias("word"))


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """Probe: for each candidate key, `maybe_member` is true iff ALL k of its
    bits are set. Adds `n_bits_hit` (how many of the k probes found their bit)
    so the fpp is auditable from the output.

    The candidate explodes to k (word_idx, mask) rows, LEFT-joins the bitmap
    on the word index (bitmap side broadcast — it is bounded by m_bits/63
    rows), and re-aggregates per key counting satisfied probes. A missing
    word row means no bit in that word is set — the left join's NULL counts
    as a miss, which is exactly Bloom semantics.
    """
    probes = candidates.select(
        F.col(key_col),
        F.posexplode(
            _bit_positions(F.col(key_col), m_bits, k_hashes)
        ).alias("__i", "__pos"),
    ).select(
        F.col(key_col),
        F.col("__i"),
        (F.col("__pos") / WORD_BITS).cast("long").alias("word_idx"),
        _word_mask().alias("__mask"),
    )
    hit = (
        probes.join(broadcast(bloom), on="word_idx", how="left")
        .select(
            F.col(key_col),
            F.when(
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask")),
                1,
            )
            .otherwise(0)
            .alias("__hit"),
        )
    )
    return hit.groupBy(key_col).agg(
        F.sum("__hit").cast("long").alias("n_bits_hit"),
        (F.sum("__hit") == k_hashes).alias("maybe_member"),
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two Bloom bitmaps built with the same (m_bits, k_hashes): OR
    the word rows together. Because the filter is relational, incremental
    ingest unions yesterday's filter with the delta batch's — no rebuild,
    no driver-side sketch objects, and the result is again just a
    (word_idx, word) table."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
