"""Market-basket co-occurrence analysis.

The association-rules primer operator: which items appear together in the
same basket, with enough support to matter. Outputs exact integer supports
plus a lift score computed as one IEEE division of exact counts — engines
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from aci_export_spark.artifacts import persist_tracked


def bounded_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int = 64,
) -> DataFrame:
    """The size-capped distinct (basket, item) table — the shared input of
    every basket analysis (pair/triple co-occurrence, the co-occurrence
    GRAPH builds): distinct(basket, item), baskets above
    ``max_basket_items`` dropped BEFORE any self-join (a single hot basket
    otherwise contributes O(n²) pair rows — the classic basket-skew
    blowup; the cap makes join volume provably ≤ baskets·cap²/2), and the
    result repartitioned on the basket key so every downstream self-join
    reads co-partitioned data. Columns are (__b, __i)."""
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    sizes = items.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    return items.join(
        sizes.filter(F.col("__n") <= max_basket_items).select("__b"), on="__b"
    ).repartition(F.col("__b"))


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 20,
    max_basket_items: int = 64,
    bounded: DataFrame | None = None,
) -> DataFrame:
    """Top-`top_k` item pairs by basket co-occurrence: support counts for the
    pair and each item, total basket count, and lift.

    Basket semantics: item multiplicity within a basket does not inflate
    support — see :func:`bounded_baskets` for the distinct + size-cap
    contract. ``bounded`` lets a pipeline pass an already-materialized
    :func:`bounded_baskets` table (built once per corpus snapshot, shared
    with the triple pass and the co-occurrence graph queries) instead of
    re-deriving it.

    Plan: distinct (shuffle on basket,item) → basket-size filter (same
    basket key, co-partitioned agg + join) → self-join on the basket key
    (again co-partitioned — one physical exchange serves the distinct, the
    size filter, and the join) → pair count (small shuffle) → per-item
    supports and the 1-row basket total both broadcast back → top-k via
    TakeOrderedAndProject (per-partition partial top-k, no global sort).
    """
    if bounded is None:
        # `bounded` feeds FOUR consumers (both self-join sides, item
        # supports, the basket total) — persisted (query-scoped lifecycle)
        # so the subtree materializes once instead of re-scanning the fact
        # per consumer (without it the plan re-derives it 4×: 20 scans, 23
        # exchanges), and the basket partitioning makes the self-join
        # exchange-free
        bounded = persist_tracked(
            bounded_baskets(df, basket_col, item_col, max_basket_items)
        )
    a = bounded.select("__b", F.col("__i").alias("item_a"))
    b = bounded.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, on="__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
    )
    item_support = bounded.groupBy(F.col("__i")).agg(
        F.count(F.lit(1)).alias("__s")
    )
    total = bounded.select("__b").distinct().agg(
        F.count(F.lit(1)).alias("__total")
    )
    scored = (
        pairs.join(
            broadcast(item_support.select(F.col("__i").alias("item_a"), F.col("__s").alias("support_a"))),
            on="item_a",
        )
        .join(
            broadcast(item_support.select(F.col("__i").alias("item_b"), F.col("__s").alias("support_b"))),
            on="item_b",
        )
        .join(broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            F.col("__total").alias("n_baskets"),
            # lift = P(a∧b)/(P(a)·P(b)) — one division of exact BIGINT
            # products, so both engines produce the identical double
            (
                (F.col("pair_support") * F.col("__total")).cast("double")
                / (F.col("support_a") * F.col("support_b")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("pair_support").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(top_k)


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 70,
    top_k: int = 20,
    max_basket_items: int = 64,
    bounded: DataFrame | None = None,
) -> DataFrame:
    """Top-`top_k` frequent item TRIPLES with A-priori pruning: a triple can
    only reach `min_support` if all three of its pairs do (monotonicity), so
    the pair-frequency table — tiny after thresholding — semi-joins into the
    enumeration BEFORE the third basket join, cutting the candidate stream
    from O(baskets·cap³) to the frequent-pair fan-out. This prune-early
    shape is the entire A-priori idea and exactly what survives at 100 TB;
    the size cap bounds the per-basket blowup as in
    :func:`cooccurrence_pairs`. ``bounded`` takes a prebuilt
    :func:`bounded_baskets` table (the shared-artifact path).
    """
    if bounded is None:
        bounded = persist_tracked(
            bounded_baskets(df, basket_col, item_col, max_basket_items)
        )
    a = bounded.select("__b", F.col("__i").alias("item_a"))
    b = bounded.select("__b", F.col("__i").alias("item_b"))
    c = bounded.select("__b", F.col("__i").alias("item_c"))
    freq_pairs = persist_tracked(
        a.join(b, on="__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("__ps"))
        .filter(F.col("__ps") >= min_support)
        .select("item_a", "item_b")
    )
    cand = (
        a.join(b, on="__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .join(broadcast(freq_pairs), on=["item_a", "item_b"], how="left_semi")
        .join(c, on="__b")
        .filter(F.col("item_b") < F.col("item_c"))
        .join(
            broadcast(
                freq_pairs.select(
                    F.col("item_a").alias("item_b"), F.col("item_b").alias("item_c")
                )
            ),
            on=["item_b", "item_c"],
            how="left_semi",
        )
        .join(
            broadcast(
                freq_pairs.select(
                    F.col("item_a"), F.col("item_b").alias("item_c")
                )
            ),
            on=["item_a", "item_c"],
            how="left_semi",
        )
    )
    triples = (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("triple_support"))
        .filter(F.col("triple_support") >= min_support)
    )
    return triples.orderBy(
        F.col("triple_support").desc(),
        F.col("item_a").asc(),
        F.col("item_b").asc(),
        F.col("item_c").asc(),
    ).limit(top_k)
