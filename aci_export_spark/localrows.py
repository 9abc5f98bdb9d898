"""Tiny driver-computed result tables as pure-JVM literal plans.

Several operators finish a bounded driver-side computation (exact-quantile
binary search, MM/EM fixed points, exact test statistics) and emit a small
DataFrame. ``spark.createDataFrame(rows)`` routes those rows through a
pickled Python RDD parallelized to ``defaultParallelism`` slices — the
materializing action then runs one PYTHON WORKER ROUND TRIP PER SLICE
(32 tasks for a 5-row table on local[32]; measured 0.64 s per noop save
vs 0.16 s for the literal plan below, and `.coalesce(1)` is WORSE at
3.8 s because one worker then replays all slices sequentially).

:func:`local_rows_df` instead builds ``explode(array(struct(lit…)))`` —
a LocalTableScan-style plan evaluated entirely in the JVM: no Python
task, no pickle, one generated row batch. Literal plans grow with the
row count, so beyond ``max_literal_rows`` it falls back to
``createDataFrame`` (where the per-slice overhead amortizes anyway).

Value fidelity: every literal is cast to the DECLARED field type, so
ints stay exact int64, doubles keep their bit pattern (Catalyst Literal
holds the Python float verbatim), and None becomes a typed NULL —
asserted by tests/test_localrows.py against createDataFrame output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


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
    from pyspark.sql.types import ArrayType

    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, st.fields)
            ]
        )
        for r in rows
    ]
    # literals infer nullable=false; casting the array to the DECLARED
    # struct type (all-nullable like createDataFrame's) makes the output
    # schema-identical — the oracle compares schemas, not just values
    arr = F.array(*structs).cast(ArrayType(st, containsNull=False))
    return (
        spark.range(1)
        .select(F.explode(arr).alias("__r"))
        .select("__r.*")
    )
