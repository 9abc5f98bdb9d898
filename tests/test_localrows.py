"""local_rows_df must be value- and schema-identical to createDataFrame —
including double bit patterns, typed NULLs, booleans, and arrays — while
producing a pure-JVM plan (no Python RDD scan)."""

from __future__ import annotations

import math
import struct

import pytest

from aci_export_spark.localrows import local_rows_df


@pytest.fixture(scope="module")
def spark():
    from aci_export_spark.session import get_spark

    s = get_spark("test-localrows", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def test_values_and_schema_match_createdataframe(spark):
    rows = [
        (1, "a", 0.1 + 0.2, True, None),
        (2, None, float("1e-308"), False, 7),
        (-(2**62), "", -0.0, None, None),
    ]
    schema = "k long, s string, d double, b boolean, opt long"
    got = local_rows_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema=schema)
    assert got.schema == ref.schema
    g = sorted(got.collect(), key=lambda r: r["k"])
    r = sorted(ref.collect(), key=lambda r: r["k"])
    for a, b in zip(g, r):
        assert a["k"] == b["k"] and a["s"] == b["s"] and a["b"] == b["b"]
        assert a["opt"] == b["opt"]
        assert _bits(a["d"]) == _bits(b["d"]), "double bit pattern must hold"


def test_array_columns(spark):
    rows = [(0, [1.5, 2.5]), (1, [0.1, -0.0])]
    schema = "cell int, centroid array<double>"
    got = local_rows_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema=schema)
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_pure_jvm_plan_and_fallback(spark):
    df = local_rows_df(spark, [(1, "x")], "a long, b string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan and "BatchEvalPython" not in plan
    # above the cap: falls back to createDataFrame (python RDD scan)
    big = [(i, "x") for i in range(2000)]
    df2 = local_rows_df(spark, big, "a long, b string")
    assert df2.count() == 2000


def test_empty_rows(spark):
    df = local_rows_df(spark, [], "a long, b string")
    assert df.count() == 0 and len(df.schema) == 2
