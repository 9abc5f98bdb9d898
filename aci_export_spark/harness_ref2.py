"""Harness entries for the remaining reference operator families
(SURVEY.md §2) not already embodied by harness.py: J3/J4/J7/J12/J14 join
variants, P9 email validity, F11/F12 typed merge-field rendering, S13
schema diff, A9 sync stats, A10 set-difference count.

Each reuses the production operator/function modules (operators/, sync/,
functions/) so the oracle checks the same code the pipelines run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.harness import register
from aci_export_spark.sources import read_table


@register(
    "j3_self_join_partner",
    """
SELECT p.c_custkey, p.c_name,
       q.c_custkey AS partner_custkey, q.c_name AS partner_name,
       q.c_acctbal AS partner_acctbal
FROM customer p LEFT JOIN customer q ON q.c_custkey = p.c_custkey + 1
""",
    doc="self-join with alias: primary row joined to its partner row from "
    "the same table (J3, ddb/src/members.rs:486-487 partner last_login)",
)
def j3_self_join_partner(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    pri = customer.alias("p")
    par = customer.alias("q")
    return pri.join(
        par, F.col("q.c_custkey") == F.col("p.c_custkey") + 1, "left"
    ).select(
        F.col("p.c_custkey").alias("c_custkey"),
        F.col("p.c_name").alias("c_name"),
        F.col("q.c_custkey").alias("partner_custkey"),
        F.col("q.c_name").alias("partner_name"),
        F.col("q.c_acctbal").alias("partner_acctbal"),
    )


@register(
    "j4_coalesce_key_join",
    """
WITH o AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS user_key,
           CASE WHEN o_orderkey % 2 = 1 THEN o_custkey END AS member_key
    FROM orders
)
SELECT o_orderkey, c_custkey, c_name
FROM o JOIN customer ON c_custkey = COALESCE(user_key, member_key)
""",
    doc="join on COALESCEd key: person = COALESCE(field_user, field_member) "
    "(J4, ddb/src/leadership.rs:85-87); coalesce happens before the "
    "equi-join so Catalyst still hash-joins",
)
def j4_coalesce_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    o = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_custkey")).alias("user_key"),
        F.when(F.col("o_orderkey") % 2 == 1, F.col("o_custkey")).alias("member_key"),
    )
    keyed = o.withColumn("c_custkey", F.coalesce("user_key", "member_key"))
    return keyed.join(customer, on="c_custkey").select(
        "o_orderkey", "c_custkey", "c_name"
    )


@register(
    "j7_existence_flags",
    """
SELECT c_custkey,
       EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderstatus = 'O') AS has_open_link,
       EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderstatus = 'F') AS has_filled_link,
       EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderstatus = 'P') AS has_pending_link
FROM customer
""",
    doc="existence-flag outer joins: LEFT JOIN three link tables, emit "
    "IS NOT NULL booleans (J7, ddb/src/members.rs:224-232,333-338)",
)
def j7_existence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")

    def link(status: str, flag: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
            .withColumn(flag, F.lit(True))
        )

    out = customer.select("c_custkey")
    for status, flag in [("O", "has_open_link"), ("F", "has_filled_link"), ("P", "has_pending_link")]:
        out = out.join(link(status, flag), on="c_custkey", how="left")
    return out.select(
        "c_custkey",
        *[
            F.coalesce(F.col(flag), F.lit(False)).alias(flag)
            for flag in ("has_open_link", "has_filled_link", "has_pending_link")
        ],
    )


@register(
    "j12_referential_integrity",
    """
SELECT l_orderkey, l_linenumber, l_suppkey
FROM lineitem
WHERE EXISTS (SELECT 1 FROM supplier
              WHERE s_suppkey = l_suppkey AND s_acctbal > 0)
""",
    doc="referential-integrity filter before FK-bearing writes: keep facts "
    "whose dimension key exists in the upserted set (J12, "
    "sync-app/src/sync.rs:541-590) — left_semi against the dimension",
)
def j12_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    valid = supplier.filter(F.col("s_acctbal") > 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return li.join(broadcast(valid), on="l_suppkey", how="left_semi").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )


@register(
    "j14_entity_resolution_coalesce",
    """
WITH opens AS (
    SELECT o_custkey, MIN(o_orderkey) AS open_key FROM orders
    WHERE o_orderstatus = 'O' GROUP BY o_custkey
), filled AS (
    SELECT o_custkey, MIN(o_orderkey) AS filled_key FROM orders
    WHERE o_orderstatus = 'F' GROUP BY o_custkey
)
SELECT c_custkey,
       COALESCE(open_key, filled_key) AS entity_key,
       open_key IS NOT NULL AS is_open
FROM customer
LEFT JOIN opens ON o_custkey = c_custkey
LEFT JOIN filled ON filled.o_custkey = c_custkey
WHERE COALESCE(open_key, filled_key) IS NOT NULL
""",
    doc="microsite-admin entity resolution: two LEFT JOINs on the same link "
    "table under different bundle filters, COALESCE(region, club) + "
    "is_region flag (J14, ddb/src/roles.rs:43-66)",
)
def j14_entity_resolution_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")

    def pick(status: str, out: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(F.min("o_orderkey").alias(out))
        )

    return (
        customer.join(pick("O", "open_key"), on="c_custkey", how="left")
        .join(pick("F", "filled_key"), on="c_custkey", how="left")
        .withColumn("entity_key", F.coalesce("open_key", "filled_key"))
        .filter(F.col("entity_key").isNotNull())
        .select(
            "c_custkey",
            "entity_key",
            F.col("open_key").isNotNull().alias("is_open"),
        )
    )


@register(
    "p9_email_validity",
    """
WITH m AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 11 = 0 THEN ''
                ELSE replace(lower(c_name), ' ', '.') ||
                     CASE WHEN c_custkey % 10 = 0 THEN '@noemail.com'
                          WHEN c_custkey % 10 = 5 THEN '@example.com'
                          ELSE '@mail.test' END
           END AS email
    FROM customer
)
SELECT c_custkey, email FROM m
WHERE email <> ''
  AND email NOT LIKE '%noemail.com'
  AND email NOT LIKE '%example.com'
""",
    doc="email validity filter: drop empty and placeholder-domain addresses "
    "(P9, mailchimp/src/members.rs:111-114); uses functions.text.valid_email",
)
def p9_email_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aci_export_spark.functions.text import valid_email

    customer = read_table(spark, sf_dir, "customer")
    domain = (
        F.when(F.col("c_custkey") % 10 == 0, "@noemail.com")
        .when(F.col("c_custkey") % 10 == 5, "@example.com")
        .otherwise("@mail.test")
    )
    email = F.when(F.col("c_custkey") % 11 == 0, "").otherwise(
        F.concat(F.replace(F.lower(F.col("c_name")), F.lit(" "), F.lit(".")), domain)
    )
    m = customer.select("c_custkey", email.alias("email"))
    return m.filter(valid_email(F.col("email")))


@register(
    "f11_f12_merge_field_render",
    """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS joined,
       strftime(CAST(o_orderdate AS DATE), '%m/%d') AS bday,
       CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR) AS price_num,
       o_orderpriority AS prio_text
FROM orders
""",
    doc="typed merge-field rendering: Date '%Y-%m-%d', Birthday '%m/%d', "
    "number, text (F11/F12, mailchimp/src/merge_fields.rs:286-365); uses "
    "sync.mail.render_merge_field",
)
def f11_f12_merge_field_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aci_export_spark.sync.mail import render_merge_field

    orders = read_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        render_merge_field("date", d).alias("joined"),
        render_merge_field("birthday", d).alias("bday"),
        render_merge_field("number", F.col("o_totalprice")).alias("price_num"),
        render_merge_field("text", F.col("o_orderpriority")).alias("prio_text"),
    )


@register(
    "s13_merge_field_schema_diff",
    """
WITH local AS (
    SELECT p_brand AS tag, MIN(p_type) AS name, CAST(MIN(p_size) AS VARCHAR) AS type
    FROM part WHERE p_partkey % 2 = 0 GROUP BY p_brand
), remote AS (
    SELECT p_brand AS tag, MIN(p_type) AS name, CAST(MIN(p_size) AS VARCHAR) AS type
    FROM part WHERE p_partkey % 3 = 0 GROUP BY p_brand
)
SELECT 'create' AS op, tag, name, type FROM local
WHERE tag NOT IN (SELECT tag FROM remote)
UNION ALL
SELECT 'delete' AS op, tag, name, type FROM remote
WHERE tag NOT IN (SELECT tag FROM local)
UNION ALL
SELECT 'update' AS op, l.tag, l.name, l.type
FROM local l JOIN remote r ON l.tag = r.tag
WHERE l.name <> r.name OR l.type <> r.type
""",
    doc="merge-field schema diff (S13, mailchimp/src/merge_fields.rs:51-101): "
    "local vs remote field sets → create/delete/update ops via two "
    "broadcast anti-joins + a changed-row join; uses "
    "sync.mail.merge_field_schema_diff",
)
def s13_merge_field_schema_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aci_export_spark.sync.mail import merge_field_schema_diff

    part = read_table(spark, sf_dir, "part")

    def defs(mod: int) -> DataFrame:
        return (
            part.filter(F.col("p_partkey") % mod == 0)
            .groupBy(F.col("p_brand").alias("tag"))
            .agg(
                F.min("p_type").alias("name"),
                F.min("p_size").cast("string").alias("type"),
            )
        )

    diff = merge_field_schema_diff(defs(2), defs(3))
    return (
        diff["to_create"].select(F.lit("create").alias("op"), "tag", "name", "type")
        .unionByName(diff["to_delete"].select(F.lit("delete").alias("op"), "tag", "name", "type"))
        .unionByName(diff["to_update"].select(F.lit("update").alias("op"), "tag", "name", "type"))
    )


@register(
    "a9_sync_stats",
    """
WITH source AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0),
     target AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 <> 0)
SELECT 'orders' AS entity,
       (SELECT COUNT(*) FROM source) AS upserted,
       (SELECT COUNT(*) FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)) AS deleted
""",
    doc="per-entity SyncStats {upserted, deleted} computed as aggregates of "
    "the mirror diff (A9, sync-app/src/sync.rs:11-28,621-637)",
)
def a9_sync_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    target = orders.filter(F.col("o_orderkey") % 10 != 0).select("o_orderkey")
    upserted = source.agg(F.count(F.lit(1)).alias("upserted"))
    deleted = (
        target.join(source, on="o_orderkey", how="left_anti")
        .agg(F.count(F.lit(1)).alias("deleted"))
    )
    return (
        upserted.crossJoin(deleted)
        .select(F.lit("orders").alias("entity"), "upserted", "deleted")
    )


@register(
    "a10_set_difference_count",
    """
SELECT COUNT(*) AS n_to_delete FROM (
    SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
)
""",
    doc="set-difference count: |audience − keep| reported before the retain "
    "deletes run (A10, mailchimp/src/members.rs:85-96)",
)
def a10_set_difference_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    audience = orders.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    keep = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    return (
        audience.join(keep, on="o_orderkey", how="left_anti")
        .agg(F.count(F.lit(1)).alias("n_to_delete"))
    )
