"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the part that matters at 100 TB):
- nothing compares all pairs: candidates come from hash buckets (exact key,
  LSH band, SimHash prefix), so the shuffle volume is O(n · bands), not O(n²);
- bucket keys are uniform hashes → no skew;
- verification (exact Jaccard) runs only inside candidate buckets.

All hashing is md5-derived (see `hashing.py`) so results are engine-portable
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aci_export_spark.functions.text import normalize_text
from aci_export_spark.llm.hashing import hash64, minhash_signature


def word_tokens(text: Column) -> Column:
    """Whitespace tokens of normalized text (portable: same split in DuckDB
    via string_split_regex(lower(..), '\\s+'))."""
    return F.split(normalize_text(text), r"\s+")


def exact_dedup_by_key(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy a content key, keep the smallest id.

    The key should be a digest (md5 of normalized content) — grouping on a
    fixed-width hash instead of raw text keeps shuffle rows small and uniform.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    bucket_col: str,
    threshold: float,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs within a bucket.

    `bucket_col` bounds the comparison set (language, LSH band, IVF cell…);
    the self-join is an equi-join on the bucket so Spark shuffles each bucket
    once. Emits (id_a < id_b, jaccard) for pairs ≥ threshold.
    """
    sets = df.select(
        F.col(id_col), F.col(bucket_col).alias("__bucket"),
        F.array_distinct(F.col(token_col)).alias("__set"),
    )
    a = sets.select(
        F.col("__bucket"),
        F.col(id_col).alias("id_a"), F.col("__set").alias("set_a"),
    )
    b = sets.select(
        F.col("__bucket"),
        F.col(id_col).alias("id_b"), F.col("__set").alias("set_b"),
    )
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = F.size(F.array_union("set_a", "set_b")).cast("double")
    jac = (inter / union).alias("jaccard")
    return (
        pairs.select("id_a", "id_b", jac)
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs.

    signature (num_hashes mins) → split into `bands` bands of
    num_hashes/bands values → explode one row per (doc, band) keyed by
    md5(band values) → self-join per (band_id, band_key). Each doc
    contributes exactly `bands` shuffle rows regardless of size; candidate
    generation is linear in n. Returns distinct (id_a < id_b) pairs.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(F.col(shingle_col), num_hashes).alias("__sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("__sig").getItem(i * rows_per_band + j).cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("__b")).select(
        F.col(id_col), F.col("__b.band_id"), F.col("__b.band_key")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    return (
        a.join(b, on=["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
) -> DataFrame:
    """Full near-dup pipeline: shingle → MinHash → LSH buckets → exact-Jaccard
    verify on candidates only. Returns (id_a, id_b, jaccard ≥ threshold)."""
    from aci_export_spark.functions.text import char_ngrams

    shingled = df.select(
        F.col(id_col),
        F.array_distinct(char_ngrams(F.col(text_col), shingle_size)).alias("__sh"),
    ).filter(F.size("__sh") > 0)

    cand = minhash_lsh_candidates(shingled, id_col, "__sh", num_hashes, bands)

    # verify candidates with exact Jaccard on the shingle sets (broadcast-size
    # candidate list at test SF; at corpus scale this is a shuffle join on id)
    sh_a = shingled.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("set_a"))
    sh_b = shingled.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("set_b"))
    verified = (
        cand.join(sh_a, on="id_a").join(sh_b, on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


SIMHASH_BITS = 32


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash of each document's distinct token set.

    Classic bit-voting, shaped for Spark: explode tokens → one md5-derived
    hash per (doc, token) row → groupBy(doc) with 32 conditional sums (one
    per bit) → assemble the output integer from vote signs. One shuffle on
    doc id (uniform, high-cardinality); everything else is codegen.

    Hamming distance between SimHashes approximates similarity of the token
    sets. Distinct tokens (set semantics) keep it length-invariant.
    """
    from aci_export_spark.llm.hashing import _hash64_lambda

    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias("__t"),
    ).withColumn("__h", _hash64_lambda(F.col("__t"), "simhash:"))

    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    out = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        out = out + F.when(F.col(f"__v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return voted.select(F.col(id_col), out.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, prefix_bits: int = 8
) -> DataFrame:
    """SimHash near-dup: bucket by the top `prefix_bits` of the simhash, then
    verify Hamming distance inside buckets only.

    The prefix bucket bounds the join (near-identical docs share high bits
    with high probability); for guaranteed recall at scale, run with several
    bit-rotations — this single-probe version is the harness embodiment.
    """
    sh = simhash_table(df, id_col, text_col).withColumnRenamed("simhash", "__simhash")
    sh = sh.withColumn("__bucket", F.shiftright("__simhash", SIMHASH_BITS - prefix_bits))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__simhash").alias("h_a"), "__bucket")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__simhash").alias("h_b"), "__bucket")
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
