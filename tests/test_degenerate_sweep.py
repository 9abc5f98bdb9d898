"""Degenerate-corpus differential sweep: every SQL-string-oracle query runs
on a pathological tiny dataset in BOTH engines and must agree.

The oracle contract is differential — a string oracle states the query's
semantics for ANY input, not just the driver fixture. Degenerate inputs
(constant metric columns, a single day of events, one-member groups, empty
joins) are where engines genuinely diverge: x/0 is NULL under Spark's
non-ANSI divide but Inf/NaN under DuckDB's IEEE divide, empty aggregates
surface as NULL vs missing rows, and so on. Two such divergences were
found by inspection (the histogram/drift guards); this sweep mechanizes
the hunt across the whole registry.

Golden/generated oracles (callables) are excluded — they embed values
computed FROM the driver fixture (numpy kmeans centroids, CDC VALUES
lists) and are pinned to sf0.01 by design, so they have no cross-input
contract to check.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from aci_export_spark import harness
from aci_export_spark.harness import REGISTRY

harness._ensure_all_registered()

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: queries with a plain-SQL (string) oracle — the sweep population
_STRING_ORACLE = sorted(
    name for name, spec in REGISTRY.items() if isinstance(spec.oracle, str)
)


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """A schema-correct corpus built to be maximally degenerate: constant
    value columns, all events inside ONE hour of ONE day, single-language
    single-source documents with shared text, one embedding cluster with
    duplicate vectors, and just enough rows per table that every join has
    at least one match."""
    out = tmp_path_factory.mktemp("degenerate_sf")
    con = duckdb.connect()
    ddl = {
        "region": """
            SELECT CAST(i AS INTEGER) AS r_regionkey,
                   'REGION_' || i AS r_name
            FROM range(2) t(i)""",
        "nation": """
            SELECT CAST(i AS INTEGER) AS n_nationkey,
                   'NATION_' || i AS n_name,
                   CAST(i % 2 AS INTEGER) AS n_regionkey
            FROM range(4) t(i)""",
        "customer": """
            SELECT CAST(i AS BIGINT) AS c_custkey,
                   'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
                   CAST(i % 4 AS INTEGER) AS c_nationkey,
                   CAST(100.0 AS DOUBLE) AS c_acctbal,
                   CASE WHEN i % 2 = 0 THEN 'BUILDING' ELSE 'MACHINERY' END
                       AS c_mktsegment
            FROM range(1, 13) t(i)""",
        "supplier": """
            SELECT CAST(i AS BIGINT) AS s_suppkey,
                   'Supplier#' || i AS s_name,
                   CAST(i % 4 AS INTEGER) AS s_nationkey,
                   CAST(50.0 AS DOUBLE) AS s_acctbal
            FROM range(1, 5) t(i)""",
        "part": """
            SELECT CAST(i AS BIGINT) AS p_partkey,
                   'part number ' || i AS p_name,
                   'Brand#' || (i % 3) AS p_brand,
                   'TYPE A' AS p_type,
                   CAST(7 AS INTEGER) AS p_size,
                   CAST(950.0 AS DOUBLE) AS p_retailprice
            FROM range(1, 7) t(i)""",
        "orders": """
            SELECT CAST(i AS BIGINT) AS o_orderkey,
                   CAST(1 + (i % 12) AS BIGINT) AS o_custkey,
                   CASE WHEN i % 3 = 0 THEN 'O' ELSE 'F' END AS o_orderstatus,
                   CAST(1000.0 AS DOUBLE) AS o_totalprice,
                   TIMESTAMP '2024-03-01 00:00:00' AS o_orderdate,
                   '1-URGENT' AS o_orderpriority
            FROM range(1, 21) t(i)""",
        "lineitem": """
            SELECT CAST(1 + (i % 20) AS BIGINT) AS l_orderkey,
                   CAST(1 + (i % 6) AS BIGINT) AS l_partkey,
                   CAST(1 + (i % 4) AS BIGINT) AS l_suppkey,
                   CAST(1 + (i % 3) AS INTEGER) AS l_linenumber,
                   CAST(5.0 AS DOUBLE) AS l_quantity,
                   CAST(500.0 AS DOUBLE) AS l_extendedprice,
                   CAST(0.0 AS DOUBLE) AS l_discount,
                   CAST(0.0 AS DOUBLE) AS l_tax,
                   CASE WHEN i % 2 = 0 THEN 'R' ELSE 'N' END AS l_returnflag,
                   'O' AS l_linestatus,
                   TIMESTAMP '2024-03-02 00:00:00' AS l_shipdate
            FROM range(40) t(i)""",
        # ONE hour of ONE day; constant value; every funnel step present
        "events": """
            SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-03-01 12:00:00'
                       + INTERVAL (i % 50) MINUTE AS ts,
                   CAST(1 + (i % 5) AS BIGINT) AS user_id,
                   ['signup','view','click','purchase','error'][1 + i % 5]
                       AS event_type,
                   CAST(5.5 AS DOUBLE) AS value,
                   '{"k": ' || (i % 3) || '}' AS props
            FROM range(60) t(i)""",
        # single lang/source; docs 1-3 share identical text (dup cliques),
        # doc 4 is empty-ish, doc 5 long and unique
        "documents": """
            SELECT CAST(i AS BIGINT) AS doc_id,
                   CASE
                     WHEN i <= 3 THEN
                       'the same exact document text repeated verbatim across '
                       || 'several rows to force duplicate cliques and shared '
                       || 'anchors in every dedup operator under test'
                     WHEN i = 4 THEN 'x'
                     ELSE 'a unique long document ' || repeat('filler word ', 40)
                          || i
                   END AS text,
                   'en' AS lang,
                   'src0' AS source,
                   CAST(length(CASE
                     WHEN i <= 3 THEN
                       'the same exact document text repeated verbatim across '
                       || 'several rows to force duplicate cliques and shared '
                       || 'anchors in every dedup operator under test'
                     WHEN i = 4 THEN 'x'
                     ELSE 'a unique long document ' || repeat('filler word ', 40)
                          || i
                   END) AS BIGINT) AS n_chars
            FROM range(1, 9) t(i)""",
        # duplicate vectors (ids 1-3 identical), one lonely far vector
        "embeddings": """
            SELECT CAST(i AS BIGINT) AS vec_id,
                   CASE WHEN i <= 3
                        THEN list_transform(range(64), x -> CAST(1.0 AS FLOAT))
                        ELSE list_transform(range(64),
                             x -> CAST(CASE WHEN x = i THEN -1.0 ELSE 0.0 END
                                       AS FLOAT))
                   END AS embedding,
                   CAST(i % 2 AS INTEGER) AS label
            FROM range(1, 9) t(i)""",
    }
    for t in TABLES:
        con.execute(
            f"COPY ({ddl[t]}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'"
        )
    return str(out), con


def _vhash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.md5(
        str(
            sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
        ).encode()
    ).hexdigest()


@pytest.mark.parametrize("name", _STRING_ORACLE)
def test_degenerate_agreement(spark, degenerate_dir, name):
    sf_dir, con = degenerate_dir
    spec = REGISTRY[name]
    got = spec.fn(spark, sf_dir).toPandas()
    want = con.sql(spec.oracle).df()
    assert len(got) == len(want), (
        f"{name}: row count diverged on degenerate corpus "
        f"(spark {len(got)} vs oracle {len(want)})"
    )
    assert _vhash(got) == _vhash(want), (
        f"{name}: values diverged on degenerate corpus\n"
        f"spark:\n{got.head(20)}\noracle:\n{want.head(20)}"
    )
