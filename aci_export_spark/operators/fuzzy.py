"""Fuzzy string matching for entity resolution: edit-distance-1 pairs via
FastSS deletion-neighborhood blocking (Bocek et al. 2007).

Every string generates its deletion neighborhood — the string itself plus
each single-character-deletion variant. Two strings within edit distance 1
(one substitution, insertion, or deletion) ALWAYS share a neighborhood
member, so joining on the variant gives guaranteed recall; an exact
`levenshtein` verify removes the false positives (anagram-style variant
collisions).

Scale shape: candidate volume is n·(len+1) variant rows — linear in the
corpus for bounded key length — and block sizes are governed by variant
entropy, not corpus size (deleting one char of a high-entropy key leaves a
high-entropy key). Compare the pigeonhole SimHash blocks
(`llm/dedup.simhash_near_dup_pairs_blocked`) and the AllPairs Jaccard
prefix filter (`llm/dedup.jaccard_pairs_prefix`): same
block-join-then-verify discipline, third string metric. The verify is one
`levenshtein` call per candidate — a JVM codegen expression, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(name_col: str) -> "F.Column":
    """array<string>: the string plus every single-deletion variant, as one
    column expression (sequence → transform → concat of the two halves);
    array_union also dedups repeated variants from runs of equal chars."""
    name = F.col(name_col)
    return F.array_union(
        F.array(name),
        F.transform(
            F.sequence(F.lit(1), F.length(name)),
            lambda i: F.concat(
                name.substr(F.lit(1), i - 1),
                name.substr(i + 1, F.length(name) - i),
            ),
        ),
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """(id_a, id_b, distance) for every pair within `max_distance` edits,
    id_a < id_b. Only k=1 is implemented (the FastSS neighborhood for k>1
    grows as len^k — at that point switch to PassJoin partitioning)."""
    if max_distance != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for max_distance=1"
        )
    # variants join on their 64-bit hash, not the string: the block join and
    # the candidate-dedup shuffle then carry fixed 8-byte keys instead of
    # ~name-length strings. A hash collision can only ADD a false candidate,
    # which the exact levenshtein verify below removes — recall is untouched.
    v = df.select(
        F.col(id_col),
        F.explode(
            F.transform(deletion_variants(name_col), lambda s: F.xxhash64(s))
        ).alias("__vh"),
    )
    a = v.select(F.col(id_col).alias("id_a"), "__vh")
    b = v.select(F.col(id_col).alias("id_b"), "__vh")
    cand = (
        a.join(b, on="__vh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # dedup BEFORE the verify: one levenshtein per pair
    )
    # names rejoin AFTER the dedup (name-table-sized joins, broadcast when
    # small), so the wide strings never ride the candidate shuffles
    names = df.select(F.col(id_col), F.col(name_col))
    cand = cand.join(
        names.select(F.col(id_col).alias("id_a"), F.col(name_col).alias("__na")),
        on="id_a",
    ).join(
        names.select(F.col(id_col).alias("id_b"), F.col(name_col).alias("__nb")),
        on="id_b",
    )
    dist = F.levenshtein(F.col("__na"), F.col("__nb"))
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
