"""Item-item collaborative-filtering similarity (cosine over the implicit
user-item interaction matrix).

The classic "users who touched A also touched B" recommender primitive.
With r(u,i) = interaction count, cosine(i,j) = Σ_u r(u,i)·r(u,j) /
(‖r_i‖·‖r_j‖).  Dot products and squared norms are exact BIGINT
arithmetic end-to-end; the only floats are two correctly-rounded sqrts and
one multiply+divide at the output edge — bit-identical in any IEEE-754
engine, so ranking by cosine is deterministic given the (item_a, item_b)
tie-break.

Plan shape (the part that must survive 100 TB):
  1. ratings: groupBy(user, item) count — one shuffle on the user key,
     map-side partial;
  2. norms: groupBy(item) Σcnt² — item-cardinality-sized, broadcast later;
  3. pairs: ratings self-joined on the user key — both sides carry the
     SAME hash partitioning from step 1, so AQE plans a no-exchange
     sort-merge; per-user fan-out is quadratic in that user's item count,
     so power users are capped (`max_items_per_user`), the same guardrail
     as basket co-occurrence — candidate volume stays O(Σ min(|u|, cap)²)
     instead of exploding on one hub user;
  4. dot: groupBy(item_a, item_b) Σ r_a·r_b;
  5. top-k by cosine via TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from aci_export_spark.artifacts import persist_tracked


def item_item_cosine(
    df: DataFrame,
    user_col: str,
    item_col: str,
    top_k: int = 50,
    max_items_per_user: int = 256,
) -> DataFrame:
    """Top-`top_k` item pairs by interaction-cosine: (item_a, item_b,
    dot, norm_sq_a, norm_sq_b, cosine), item_a < item_b."""
    ratings = (
        df.groupBy(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .agg(F.count(F.lit(1)).alias("r"))
    )
    sized = ratings.withColumn(
        "__n_items", F.count(F.lit(1)).over(Window.partitionBy("u"))
    )
    bounded = sized.filter(F.col("__n_items") <= max_items_per_user).drop("__n_items")
    bounded = persist_tracked(bounded)

    norms = bounded.groupBy("i").agg(F.sum(F.col("r") * F.col("r")).alias("norm_sq"))

    a = bounded.select("u", F.col("i").alias("item_a"), F.col("r").alias("ra"))
    b = bounded.select("u", F.col("i").alias("item_b"), F.col("r").alias("rb"))
    dots = (
        a.join(b, on="u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.sum(F.col("ra") * F.col("rb")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(
            F.broadcast(norms.select(F.col("i").alias("item_a"), F.col("norm_sq").alias("norm_sq_a"))),
            on="item_a",
        )
        .join(
            F.broadcast(norms.select(F.col("i").alias("item_b"), F.col("norm_sq").alias("norm_sq_b"))),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            "dot",
            F.col("norm_sq_a").cast("long").alias("norm_sq_a"),
            F.col("norm_sq_b").cast("long").alias("norm_sq_b"),
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("norm_sq_a").cast("double"))
                    * F.sqrt(F.col("norm_sq_b").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(top_k)
