"""Portable hash expressions shared by the dedup/similarity operators.

Everything derives from md5, for two reasons:
- byte-identical results in Spark, DuckDB (the oracle), and any other engine
  — xxhash64 seeds and murmur variants differ across engines;
- md5 is a JVM-side codegen expression in Spark, so throughput is fine (the
  corpus-scale cost is the shuffle, not the hash).

`hash64(col, salt)` → uniform int64 in [0, 2^60): 15 hex chars of
md5(salt ++ value). 60 bits keeps the value positive and exactly
representable in both engines' BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash of a string column.

    DuckDB equivalent: ``('0x' || substr(md5(salt || col), 1, 15))::BIGINT``.
    """
    h = F.md5(F.concat(F.lit(salt), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-side rendering of :func:`hash64` for oracle SQL."""
    return f"('0x' || substr(md5('{salt}' || {expr}), 1, 15))::BIGINT"


def min_hash(shingles: Column, salt: str) -> Column:
    """MinHash value for one hash function over an array of shingles:
    min over the array of hash64(shingle, salt). NULL-safe: empty arrays
    hash to NULL (callers filter empty docs first)."""
    hashed = F.transform(shingles, lambda s: _hash64_lambda(s, salt))
    return F.array_min(hashed)


def _hash64_lambda(col: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """array<long> MinHash signature (num_hashes independent salted hashes).

    One expression tree — evaluated in a single projection, no shuffle.

    Portable (md5-derived) but expensive: num_hashes md5 chains per shingle.
    Prefer the aggregation formulation
    (`aci_export_spark.llm.dedup.minhash_signatures`) when no cross-engine
    oracle needs to reproduce the signature.
    """
    return F.array(*[min_hash(shingles, f"mh{i}:") for i in range(num_hashes)])


