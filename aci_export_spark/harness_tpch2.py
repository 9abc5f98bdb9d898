"""Second TPC-H batch: the remaining classic decorrelation / scalar-subquery
plan shapes (Q2, Q6, Q8, Q9, Q10, Q11, Q12, Q14, Q15, Q17, Q19, Q21, Q22),
adapted to the driver's TPC-H-ish fixture schema (no partsupp / l_commitdate
/ l_shipmode / c_phone columns — each adaptation preserves the query's
characteristic plan shape, which is the point of the exercise).

Shapes exercised (and the Spark-first rewrite each decorrelates to):

- correlated scalar MIN per group        -> window min over the join (Q2)
- fully-pushed scan aggregate            -> PushedFilters + one partial agg (Q6)
- multi-fact profit rollup               -> two fact shuffles, dims broadcast (Q9)
- rank-by-aggregate top-k                -> groupBy + WindowGroupLimit (Q10)
- group value vs global-total fraction   -> two-pass agg + broadcast scalar (Q11)
- conditional-aggregate ratio            -> one scan, two CASE sums (Q14)
- argmax against a derived view          -> agg + broadcast max + equality (Q15)
- correlated scalar AVG per group        -> window avg over the join (Q17)
- EXISTS + NOT EXISTS on the same fact   -> per-group distinct-count rewrite (Q21)
- global-scalar filter + NOT EXISTS anti -> broadcast scalar + anti join (Q22)
- bilateral dimension aliasing + share   -> two nation broadcasts, ratio agg (Q8)
- join-derived predicate histogram       -> CASE-bucketed conditional counts (Q12)
- OR-of-conjunctions across join sides   -> factored per-side pushdown (Q19)

Float discipline (driver hash is exact-string): monetary math is done in
DECIMAL (exact, identical across engines) and only cast to DOUBLE at the
output boundary; order-sensitive double sums never feed a comparison or a
sort. c_acctbal carries >2-decimal values, so its exact sum uses a wide
DECIMAL(38,15) cast — the double->decimal rounding at digit 15 is tie-free
for 4-integer-digit doubles (their exact binary expansion terminates far
deeper), hence engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.harness import register, _dec
from aci_export_spark.sources import read_table


def _disc_price():
    return _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(9,2)") - F.col("l_discount").cast("decimal(9,2)")
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(9,2)))"
)


@register(
    "q2_min_cost_supplier",
    """
SELECT p_partkey, p_name, l_suppkey,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS min_price
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_type = 'LARGE' AND p_size <= 15
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                         FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    doc="TPC-H Q2 shape (min-cost supplier per part): correlated scalar MIN "
    "subquery decorrelated to a window min over the join — one fact shuffle "
    "on l_partkey, the filtered part dimension broadcasts, ties kept (both "
    "engines agree on double equality to the same stored value)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    flagged = part.filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    # the correlated subquery scans ALL lineitem rows of the part, and the
    # join applies no lineitem predicate, so min-over-the-join == the
    # correlated min; Catalyst's WindowExec reuses the join's partitioning
    w = Window.partitionBy("l_partkey")
    return (
        li.join(broadcast(flagged), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
        .select(
            "p_partkey",
            "p_name",
            "l_suppkey",
            _dec(F.col("l_extendedprice")).cast("double").alias("min_price"),
        )
    )


@register(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape (forecast revenue change): the pure predicate-"
    "pushdown showcase — every filter reaches the parquet scan "
    "(PushedFilters on shipdate/discount/quantity), a 2-column ReadSchema, "
    "and one map-side partial aggregate; zero shuffles of row data",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    sd = F.to_date("l_shipdate")
    return (
        li.filter(
            (sd >= F.lit("1998-01-01").cast("date"))
            & (sd < F.lit("1999-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice"))
                * F.col("l_discount").cast("decimal(9,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q9_product_profit",
    """
SELECT n_name AS nation, EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(9,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE contains(p_name, 'blue')
GROUP BY n_name, EXTRACT(year FROM CAST(o_orderdate AS DATE))
""",
    doc="TPC-H Q9 shape (product-line profit by supplier nation and year; "
    "p_retailprice*quantity stands in for the missing partsupp supplycost): "
    "lineitem+orders shuffle on orderkey, part/supplier/nation broadcast, "
    "the p_name filter prunes the fact through the broadcast join before "
    "the aggregation shuffle on (nation, year)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    green = part.filter(F.col("p_name").contains("blue")).select(
        "p_partkey", "p_retailprice"
    )
    profit = _disc_price() - _dec(F.col("p_retailprice")) * F.col(
        "l_quantity"
    ).cast("decimal(9,2)")
    return (
        li.join(broadcast(green), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "q10_returned_items",
    """
SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue, rnk
FROM (
    SELECT c_custkey, c_name, n_name,
           SUM({dp}) AS rev,
           ROW_NUMBER() OVER (ORDER BY SUM({dp}) DESC, c_custkey ASC) AS rnk
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
    GROUP BY c_custkey, c_name, n_name
) WHERE rnk <= 20
""".format(dp=_DISC_PRICE_SQL),
    doc="TPC-H Q10 shape (top customers by returned-item revenue): "
    "rank-by-aggregate top-k — the global ROW_NUMBER window executes as "
    "WindowGroupLimit (partial top-k per partition before the single-"
    "partition rank); ordering on the EXACT decimal sum keeps the rank "
    "engine-identical, custkey breaks ties deterministically",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    nation = read_table(spark, sf_dir, "nation")
    od = F.to_date("o_orderdate")
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (od >= F.lit("1997-01-01").cast("date"))
                & (od < F.lit("1997-04-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
            "rnk",
        )
    )


@register(
    "q11_important_stock",
    """
WITH pv AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(9,2))) AS val
    FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) >
      1.5 * CAST((SELECT SUM(val) FROM pv) AS DOUBLE)
          / CAST((SELECT COUNT(*) FROM pv) AS DOUBLE)
""",
    doc="TPC-H Q11 shape (parts holding a significant fraction of total "
    "inventory value): group value vs a global scalar — the scalar "
    "subquery decorrelates to a second aggregate broadcast-crossed into the "
    "per-part rows. The threshold is 1.5x the MEAN per-part value rather "
    "than TPC-H's fixed fraction of the total: a fixed fraction goes empty "
    "as the part count scales (the spec itself scales it by 1/SF), while "
    "the mean-relative form selects a stable tail at every SF; the exact "
    "decimal sums make the comparison engine-identical",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            _dec(F.col("l_extendedprice")) * F.col("l_quantity").cast("decimal(9,2)")
        ).alias("val")
    )
    # AQE reuses the per-part exchange for the global re-agg, so the fact is
    # scanned and shuffled once; the 1-row mean then broadcasts
    total = per_part.agg(
        F.sum("val").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.crossJoin(broadcast(total))
        .filter(
            F.col("val").cast("double")
            > F.lit(1.5)
            * F.col("__total").cast("double")
            / F.col("__n").cast("double")
        )
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "q14_promo_revenue",
    """
SELECT CAST(promo AS DOUBLE) AS promo_revenue,
       CAST(total AS DOUBLE) AS total_revenue,
       100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_pct
FROM (
    SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {dp} ELSE 0 END) AS promo,
           SUM({dp}) AS total
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1998-06-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-07-01'
)
""".format(dp=_DISC_PRICE_SQL),
    doc="TPC-H Q14 shape (promotion revenue share): conditional-aggregate "
    "ratio in one scan — two CASE-guarded decimal sums, part broadcast, no "
    "second pass; the ratio divides the two exact sums as doubles (IEEE "
    "division of identical operands is engine-identical)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    sd = F.to_date("l_shipdate")
    zero = F.lit(0).cast("decimal(28,4)")
    agged = (
        li.filter(
            (sd >= F.lit("1998-06-01").cast("date"))
            & (sd < F.lit("1998-07-01").cast("date"))
        )
        .join(
            broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
            ).alias("promo"),
            F.sum(_disc_price()).alias("total"),
        )
    )
    promo_d = F.col("promo").cast("double")
    total_d = F.col("total").cast("double")
    return agged.select(
        promo_d.alias("promo_revenue"),
        total_d.alias("total_revenue"),
        (F.lit(100.0) * promo_d / total_d).alias("promo_pct"),
    )


@register(
    "q15_top_supplier",
    """
WITH rev AS (
    SELECT l_suppkey,
           SUM({dp}) AS total_rev
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""".format(dp=_DISC_PRICE_SQL),
    doc="TPC-H Q15 shape (top supplier by quarterly revenue): argmax against "
    "a derived view — the revenue view aggregates once, its MAX broadcasts "
    "back as a 1-row scalar, and the equality keeps every tied supplier "
    "(exact decimal revenue, so ties are real ties in both engines)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    sd = F.to_date("l_shipdate")
    rev = (
        li.filter(
            (sd >= F.lit("1997-01-01").cast("date"))
            & (sd < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("total_rev"))
    )
    best = rev.agg(F.max("total_rev").alias("__best"))
    return (
        rev.crossJoin(broadcast(best))
        .filter(F.col("total_rev") == F.col("__best"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
            AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2' AND p_size < 10
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    doc="TPC-H Q17 shape (small-quantity-order revenue): correlated scalar "
    "AVG per part decorrelated to a window avg over the join (the join "
    "applies no lineitem predicate, so avg-over-the-join == the correlated "
    "avg); quantities are integral doubles, so the average is an exact "
    "integer ratio and the 0.2x threshold is engine-identical",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    flagged = part.filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10)
    ).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(broadcast(flagged), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q21_waiting_suppliers",
    """
WITH l AS (
    SELECT l_orderkey, l_suppkey,
           CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90 AS late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_suppkey, s_name
""",
    doc="TPC-H Q21 shape (suppliers who kept multi-supplier orders waiting; "
    "late = shipped >90 days after order date, standing in for the missing "
    "commit/receipt dates): the EXISTS + NOT EXISTS pair on the same fact "
    "is rewritten Spark-first as ONE per-order aggregate — n_suppliers >= 2 "
    "and n_late_suppliers == 1 — replacing two self-joins with a single "
    "distinct-count shuffle on l_orderkey that the fact join then reuses",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    l = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 90)).alias(
            "late"
        ),
    )
    stats = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("__n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "__n_late"
        ),
    )
    return (
        l.filter(F.col("late"))
        .join(stats, on="l_orderkey")
        .filter((F.col("__n_supp") >= 2) & (F.col("__n_late") == 1))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_global_balance_anti",
    """
WITH pos AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,15))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS thresh
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,15))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
  AND c_acctbal > (SELECT thresh FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
GROUP BY c_nationkey
""",
    doc="TPC-H Q22 shape (rich customers gone inactive, by country; "
    "c_nationkey stands in for the missing phone country code, and 'no "
    "orders since 1999' for 'no orders ever' — the fixture gives every "
    "customer at least one order): global-scalar AVG threshold + NOT "
    "EXISTS anti join — the positive-balance average broadcasts as a 1-row "
    "scalar, the order-existence check runs as an anti join against the "
    "date-filtered orders scan; the exact wide-decimal balance sum makes "
    "threshold and totals engine-identical",
)
def q22_global_balance_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(38,15)")
    pos = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "__thresh"
        )
    )
    return (
        customer.filter(F.col("c_nationkey").isin(list(range(14))))
        .crossJoin(broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("__thresh"))
        .join(
            orders.filter(
                F.to_date("o_orderdate") >= F.lit("1999-01-01").cast("date")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q8_market_share",
    """
WITH flat AS (
    SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
           {dp} AS vol,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
)
SELECT o_year,
       CAST(nation_vol AS DOUBLE) AS nation_volume,
       CAST(total_vol AS DOUBLE) AS total_volume,
       CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share
FROM (
    SELECT o_year,
           SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE 0 END) AS nation_vol,
           SUM(vol) AS total_vol
    FROM flat GROUP BY o_year
)
""".format(dp=_DISC_PRICE_SQL),
    doc="TPC-H Q8 shape (a nation's market share inside a regional market, "
    "by year): seven-way join with the nation dimension aliased on both "
    "the customer and supplier sides, then a conditional-aggregate share "
    "ratio per year — all dimensions broadcast, the facts shuffle once on "
    "the order key, and the share divides two exact decimal sums as "
    "doubles",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    cust_nation = (
        nation.join(
            broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("__cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(28,4)")
    flat = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(cust_nation), F.col("c_nationkey") == F.col("__cn_key"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(supp_nation), F.col("s_nationkey") == F.col("__sn_key"))
        .select(
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
            _disc_price().alias("vol"),
            "supp_nation",
        )
    )
    agged = flat.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_2", F.col("vol")).otherwise(zero)
        ).alias("nation_vol"),
        F.sum("vol").alias("total_vol"),
    )
    nv = F.col("nation_vol").cast("double")
    tv = F.col("total_vol").cast("double")
    return agged.select(
        "o_year",
        nv.alias("nation_volume"),
        tv.alias("total_volume"),
        (nv / tv).alias("mkt_share"),
    )


@register(
    "q12_late_shipment_modes",
    """
SELECT CASE WHEN CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
            THEN 'very_late' ELSE 'late' END AS speed_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
GROUP BY 1
""",
    doc="TPC-H Q12 shape (late shipments split by order priority; a derived "
    "lateness class stands in for the missing l_shipmode column): "
    "fact-fact join with a join-derived predicate, CASE-bucketed double "
    "conditional count — one shuffle on the order key, one on the 2-row "
    "grouping",
)
def q12_late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    sd = F.to_date("l_shipdate")
    od = F.to_date("o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(sd > F.date_add(od, 60))
        .groupBy(
            F.when(sd > F.date_add(od, 90), "very_late")
            .otherwise("late")
            .alias("speed_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    """
SELECT CAST(SUM({dp}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 40
       AND l_quantity BETWEEN 20 AND 50)
""".format(dp=_DISC_PRICE_SQL),
    doc="TPC-H Q19 shape (promo revenue under OR-of-conjunctions spanning "
    "both join sides): Catalyst factors per-side implied filters out of "
    "the disjunction — the part scan prunes to the three brands, the "
    "lineitem scan to the quantity envelope — before the broadcast join "
    "applies the exact residual condition",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(21, 40)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(
            broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
