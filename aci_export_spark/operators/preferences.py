"""Pairwise-preference strength estimation: the Bradley-Terry model fitted
by Hunter's MM algorithm on a distributed win/loss pair table.

The operator the RLHF data pipeline needs when it holds pairwise preference
judgments (human A/B votes, reward-model comparisons, model-arena match
results) and wants per-item latent strengths: P(i beats j) = w_i/(w_i+w_j)
(Bradley & Terry 1952), fitted by the minorization-maximization recursion
of Hunter (Annals of Statistics 2004, eq. 1.4):

    w_i  <-  W_i / sum_{j != i} n_ij / (w_i + w_j)

with W_i = total wins of i and n_ij = decisive comparisons between i and j,
then normalized to sum 1.  Like the Fellegi-Sunter EM fit
(operators/fuzzy.py), the distributed work is reducing the corpus to the
model's SUFFICIENT STATISTIC — the per-pair (games, wins) table, bounded by
the square of the item-vocabulary size, NOT the corpus — and the recursion
itself runs on the driver over that bounded collect in exact 2^-40
fixed-point rationals, so an independent from-the-spec reimplementation
reproduces every parameter bit-for-bit (no float drift to hide a wrong
update behind).

Reference parity note: the reference engine (madninja/aci-export) has no
model fitting; this extends the engine's beyond-reference analytics surface
the way operators/fuzzy.py's EM does, reusing its fixed-point discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

#: fixed-point quantum: every strength is kept as an exact multiple of
#: 2^-40 between iterations (the FS_EM_SCALE discipline of
#: operators/fuzzy.py) — rational arithmetic with BOUNDED term size, and
#: the final numerator < 2^40 < 2^53 so the edge float conversion is EXACT.
BT_SCALE = 1 << 40

BT_ITERS = 30
#: hard cap on the collected pair-count sufficient statistic (rows): the
#: MM fit is driver-side by design (vocabulary-bounded), so a vocabulary
#: that breaks the bound must raise loudly, not OOM (r10 verdict #3)
BT_MAX_PAIRS = 1_000_000


def _bt_quantize(x) -> "object":
    """Round a Fraction to the nearest 2^-40 multiple (half-up), clamped
    inside the open unit interval — the one lossy step per MM round,
    applied identically by the Spark side and the reference."""
    from fractions import Fraction

    n = (x.numerator * BT_SCALE * 2 + x.denominator) // (x.denominator * 2)
    n = max(1, min(BT_SCALE - 1, n))
    return Fraction(n, BT_SCALE)


def bt_fixed_point(
    pair_counts: list[tuple[str, str, int, int]],
    iters: int = BT_ITERS,
) -> dict[str, "object"]:
    """Fit Bradley-Terry strengths on a (item_a, item_b, wins_a, wins_b)
    pair-count list (item_a < item_b, decisive games only) via Hunter's MM,
    returning item -> strength as exact 2^-40-grid Fractions (normalized to
    sum ~1 before quantization each round).

    O(iters * pairs) exact-rational ops, data-size-independent: the pair
    table is the sufficient statistic, so corpus scale never enters here.
    """
    from fractions import Fraction

    if not pair_counts or all(wa + wb == 0 for _, _, wa, wb in pair_counts):
        raise ValueError(
            "bt_fixed_point: no decisive comparisons — the preference "
            "table is empty, so the model is unfit"
        )
    items = sorted({a for a, _, _, _ in pair_counts} | {b for _, b, _, _ in pair_counts})
    wins = {i: 0 for i in items}
    games: dict[tuple[str, str], int] = {}
    for a, b, wa, wb in pair_counts:
        wins[a] += wa
        wins[b] += wb
        games[(a, b)] = games.get((a, b), 0) + wa + wb
    w = {i: Fraction(1, len(items)) for i in items}
    for _ in range(iters):
        denom = {i: Fraction(0) for i in items}
        for (a, b), n in games.items():
            d = n / (w[a] + w[b])
            denom[a] += d
            denom[b] += d
        raw = {
            i: (Fraction(wins[i]) / denom[i] if denom[i] > 0 else Fraction(0))
            for i in items
        }
        total = sum(raw.values())
        if total == 0:
            raise ValueError("bt_fixed_point: all strengths collapsed to 0")
        w = {i: _bt_quantize(raw[i] / total) for i in items}
    return w


def bt_strengths(pair_counts: DataFrame, iters: int = BT_ITERS) -> DataFrame:
    """Bradley-Terry strengths from a distributed pair-count table with
    columns (item_a, item_b, wins_a, wins_b) where item_a < item_b and ties
    are excluded.  Returns one row per item: (item, strength, wins, games).

    strength is an EXACT double (2^-40 grid, below the 53-bit mantissa).
    The collect is bounded by the item-pair cardinality (the sufficient
    statistic), NOT the corpus — the bounded-collect discipline of
    fs_em_weights / the kmeans quantizer fit.  The bound is ENFORCED, not
    assumed (the PMI-overflow/POS_SPACE loud-guard discipline): an
    unexpectedly large item vocabulary raises a named error instead of
    OOMing the driver.
    """
    rows = pair_counts.limit(BT_MAX_PAIRS + 1).collect()
    if len(rows) > BT_MAX_PAIRS:
        raise ValueError(
            f"bt_strengths: pair-count table exceeds BT_MAX_PAIRS="
            f"{BT_MAX_PAIRS} rows — the item vocabulary is too large for "
            "a driver-side MM fit; pre-aggregate items or raise the cap "
            "deliberately"
        )
    pairs = [
        (str(r["item_a"]), str(r["item_b"]), int(r["wins_a"]), int(r["wins_b"]))
        for r in rows
    ]
    pairs.sort()
    w = bt_fixed_point(pairs, iters)
    wins: dict[str, int] = {i: 0 for i in w}
    games: dict[str, int] = {i: 0 for i in w}
    for a, b, wa, wb in pairs:
        wins[a] += wa
        wins[b] += wb
        games[a] += wa + wb
        games[b] += wa + wb
    out = [
        (i, float(w[i]), wins[i], games[i]) for i in sorted(w)
    ]
    return local_rows_df(
        pair_counts.sparkSession,
        out, schema="item string, strength double, wins long, games long"
    )


def brand_preference_pairs(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """The demo preference corpus: within each order, brand i 'beats' brand
    j when the order carries strictly more units of i than of j — a
    deterministic revealed-preference signal with the exact shape of an
    RLHF A/B table.  Returns (item_a, item_b, wins_a, wins_b), item_a <
    item_b lexicographically, ties dropped.

    Plan: lineitem joins the part dim on partkey (broadcast — part is the
    small side), per-(order, brand) exact-decimal quantity aggregate, then
    the per-order brand list is collected (fan-out bounded by the order's
    line count) and the upper-triangle pairs expand as ONE JVM array
    expression — no self-join, so the qty subtree is scanned, broadcast-
    joined and aggregated ONCE (the r12 plan computed it twice, one full
    corpus pass per join side, plus two ok-repartitions and a sort-merge
    sort; r13 plan: one scan, three exchanges, zero sorts).  At 100 TB
    everything before the final tiny aggregate is key-hashed and linear;
    the pair table stays vocabulary-bounded.
    """
    qty = (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      lineitem["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_orderkey", "p_brand")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    # sort_array on struct(brand, qty) orders by brand (brands are unique
    # within an order), so the strict upper triangle below enumerates
    # exactly the item_a < item_b pairs the self-join produced; the
    # decisive-game filter (qa != qb) compares the same exact decimals
    per_order = qty.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("p_brand").alias("b"), F.col("qty").alias("q")))
        ).alias("bs")
    )
    pairs_expr = F.expr(
        """
        flatten(transform(bs, (x, i) ->
            filter(transform(slice(bs, i + 2, size(bs) - i - 1), y ->
                       struct(x.b AS item_a, y.b AS item_b,
                              CASE WHEN x.q > y.q THEN 1 ELSE 0 END AS wa,
                              CASE WHEN y.q > x.q THEN 1 ELSE 0 END AS wb)),
                   p -> p.wa + p.wb > 0)))
        """
    )
    return (
        per_order.select(F.explode(pairs_expr).alias("p"))
        .groupBy(
            F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b")
        )
        .agg(
            F.sum("p.wa").cast("long").alias("wins_a"),
            F.sum("p.wb").cast("long").alias("wins_b"),
        )
    )


def bt_reference_python(
    lineitem_parquet: str, part_parquet: str, iters: int = BT_ITERS
) -> list[tuple[str, int, int, int]]:
    """Single-process reference for :func:`bt_strengths` over the brand
    preference corpus: DuckDB computes the pair counts independently, and
    the MM recursion below is a from-the-spec reimplementation (list-based
    accumulators, inline integer quantization — shares no code with
    ``bt_fixed_point``).  Exactness comes from the spec: every strength is
    an exact 2^-40 multiple, so both implementations follow the identical
    rational trajectory.  Returns (item, strength_num, wins, games) with
    the exact grid NUMERATOR (a >15-digit float literal would be parsed as
    DECIMAL by DuckDB and double-rounded — the fs_em_reference_python
    lesson).  Backs the golden-VALUES oracle of pref_bradley_terry_brands.
    """
    from fractions import Fraction

    import duckdb

    rows = duckdb.sql(
        f"""
        WITH qty AS (
            SELECT l_orderkey, p_brand,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
            FROM '{lineitem_parquet}' l JOIN '{part_parquet}' p
              ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        )
        SELECT a.p_brand AS ia, b.p_brand AS ib,
               SUM(CASE WHEN a.q > b.q THEN 1 ELSE 0 END)::BIGINT AS wa,
               SUM(CASE WHEN b.q > a.q THEN 1 ELSE 0 END)::BIGINT AS wb
        FROM qty a JOIN qty b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        WHERE a.q <> b.q
        GROUP BY 1, 2
        """
    ).fetchall()
    pair_list = sorted((r[0], r[1], int(r[2]), int(r[3])) for r in rows)
    items = sorted({r[0] for r in pair_list} | {r[1] for r in pair_list})
    wins = {i: 0 for i in items}
    games_tot = {i: 0 for i in items}
    games: dict[tuple[str, str], int] = {}
    for a, b, wa, wb in pair_list:
        wins[a] += wa
        wins[b] += wb
        games_tot[a] += wa + wb
        games_tot[b] += wa + wb
        games[(a, b)] = games.get((a, b), 0) + wa + wb

    def q40(x: Fraction) -> Fraction:
        num = (x.numerator * (1 << 40) * 2 + x.denominator) // (x.denominator * 2)
        return Fraction(min(max(num, 1), (1 << 40) - 1), 1 << 40)

    w = {i: Fraction(1, len(items)) for i in items}
    for _ in range(iters):
        denom = {i: Fraction(0) for i in items}
        for (a, b), n in games.items():
            d = Fraction(n) / (w[a] + w[b])
            denom[a] += d
            denom[b] += d
        raw = {
            i: (Fraction(wins[i]) / denom[i] if denom[i] > 0 else Fraction(0))
            for i in items
        }
        total = sum(raw.values())
        w = {i: q40(raw[i] / total) for i in items}
    return [
        (i, w[i].numerator * ((1 << 40) // w[i].denominator), wins[i], games_tot[i])
        for i in items
    ]
