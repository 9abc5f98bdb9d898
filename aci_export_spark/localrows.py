"""Tiny driver-computed result tables as pure-JVM literal plans.

Several operators finish a bounded driver-side computation (exact-quantile
binary search, MM/EM fixed points, exact test statistics, trainer fast
paths) and emit a small DataFrame. ``spark.createDataFrame(rows)`` routes
those rows through a pickled Python RDD parallelized to
``defaultParallelism`` slices — the materializing action then runs one
PYTHON WORKER ROUND TRIP PER SLICE (32 tasks for a 5-row table on
local[32]; measured 0.64 s per noop save vs 0.16 s for the literal plan
below, and `.coalesce(1)` is WORSE at 3.8 s because one worker then
replays all slices sequentially).

:func:`local_rows_df` instead builds ``explode(cast(array(named_struct…)))``
— a LocalTableScan-style plan evaluated entirely in the JVM: no Python
task, no pickle, one generated row batch.  The expression is rendered as
ONE SQL string and parsed with a single ``F.expr`` call: the r12 version
assembled it Column-by-Column through py4j, which costs ~5 ms of JVM
round-trip per call and made a 112-row merge table cost ~5 s to BUILD
(measured r13; the plan itself was never the problem).  Literal plans
still grow with the row count, so beyond ``max_literal_rows`` it falls
back to ``createDataFrame`` (where the per-slice overhead amortizes
anyway).

Value fidelity: every literal is cast to the DECLARED field type, so ints
stay exact int64, doubles keep their bit pattern (rendered as
``CAST('<repr>' AS DOUBLE)`` — the repr round-trips and Spark's
string→double parse is correctly rounded, the same discipline the golden
oracles use), and None becomes a typed NULL — asserted by
tests/test_localrows.py against createDataFrame output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


class _Unrenderable(Exception):
    """A value outside the SQL-literal renderer's type set — the caller
    falls back to the Column-by-Column builder (same plan, slower build)."""


def _sql_str(s: str) -> str:
    """Single-quoted Spark SQL string literal (escapedStringLiterals=false:
    backslash introduces escapes, so it must be doubled first)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return _sql_str(v)
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_lit(x) for x in v) + ")"
    raise _Unrenderable(type(v).__name__)


def _column_plan(spark: SparkSession, rows, st: StructType) -> DataFrame:
    """py4j Column-by-Column literal plan — the pre-r13 builder, kept as
    the fallback for value types the SQL renderer does not cover (dates,
    decimals). Identical output, ~5 ms of JVM round trip per Column."""
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, st.fields)
            ]
        )
        for r in rows
    ]
    arr = F.array(*structs).cast(ArrayType(st, containsNull=False))
    return spark.range(1).select(F.explode(arr).alias("__r")).select("__r.*")


def local_rows_df(
    spark: SparkSession,
    rows,
    schema: str | StructType,
    max_literal_rows: int = 1024,
) -> DataFrame:
    """Small list-of-tuples → DataFrame via a pure-JVM literal plan.

    Drop-in for ``spark.createDataFrame(rows, schema)`` for bounded
    driver-side results (same rows, same schema, same NULL semantics).
    """
    from pyspark.sql.types import _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    rows = [tuple(r) for r in rows]
    if not rows or len(rows) > max_literal_rows:
        return spark.createDataFrame(rows, schema=st)
    try:
        structs = ", ".join(
            "named_struct("
            + ", ".join(
                f"{_sql_str(f.name)}, {_sql_lit(v)}"
                for v, f in zip(r, st.fields)
            )
            + ")"
            for r in rows
        )
    except _Unrenderable:
        return _column_plan(spark, rows, st)
    # casting the array to the DECLARED struct type (all-nullable like
    # createDataFrame's) makes the output schema-identical — the oracle
    # compares schemas, not just values. ONE F.expr call parses the whole
    # table; Catalyst constant-folds it to a LocalTableScan-style batch.
    arr_type = ArrayType(st, containsNull=False).simpleString()
    expr = f"explode(cast(array({structs}) as {arr_type}))"
    return spark.range(1).select(F.expr(expr).alias("__r")).select("__r.*")
