"""Data-quality checks (the dbt-test surface): unique keys, referential
integrity, accepted values, range assertions — each returning violation
counts so a pipeline can gate a load on them.

Plan shapes, chosen per check class:

- **row-predicate checks** (accepted values, ranges, null rates) on one
  table FUSE into a single scan — one aggregate of CASE-guarded sums, then
  an unpivot to (check, n) rows. k checks cost one pass, not k.
- **key-uniqueness** needs the groupBy(key) shuffle — nothing cheaper
  proves uniqueness at scale.
- **referential integrity** is an anti join; the parent key side reduces
  to its distinct keys first, so the build side is dimension-sized.

All counts are exact integers — a report row per check, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_SCHEMA = ("check_name", "n_violations")


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once, with their multiplicity."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent — anti join against the parent's
    distinct key set (dimension-sized build side)."""
    keys = parent.select(F.col(parent_key)).distinct()
    return child.join(
        keys, child[child_key] == keys[parent_key], "left_anti"
    )


def _count_row(name: str, df_agg: DataFrame) -> DataFrame:
    return df_agg.select(
        F.lit(name).alias("check_name"),
        F.col("__n").cast("long").alias("n_violations"),
    )


def predicate_check_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Fused row-predicate checks: `checks` maps check name → violation
    predicate; all evaluate in ONE scan (CASE-guarded sums), unpivoted to
    (check_name, n_violations) rows."""
    agged = df.agg(
        *[
            F.coalesce(
                F.sum(F.when(pred, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias(f"__c{i}")
            for i, (_, pred) in enumerate(checks.items())
        ]
    )
    return agged.unpivot(
        ids=[],
        values=[f"__c{i}" for i in range(len(checks))],
        variableColumnName="__k",
        valueColumnName="n_violations",
    ).select(
        F.element_at(
            F.array(*[F.lit(n) for n in checks]),
            (F.regexp_extract("__k", r"__c(\d+)", 1).cast("int") + 1),
        ).alias("check_name"),
        "n_violations",
    )


def count_report(name: str, violations: DataFrame) -> DataFrame:
    """One (check_name, n_violations) row from a violations DataFrame —
    for the checks that need their own plan (uniqueness, FK)."""
    return _count_row(name, violations.agg(F.count(F.lit(1)).alias("__n")))


def combine_reports(*reports: DataFrame) -> DataFrame:
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def profile_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile — (column, n_rows, n_null, n_distinct, min_value,
    max_value) — in ONE aggregate. Multiple exact count-distincts make
    Catalyst expand the input k ways; that is the honest price of exact
    cardinalities (swap in approx_count_distinct for the sketch-accuracy
    version at 100 TB). min/max are emitted as strings so one report
    schema serves every column type; callers profile numeric columns via
    integer/string-typed columns (float formatting is engine-specific)."""
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__rows{i}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__dist{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max{i}"),
        ]
    agged = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__rows{i}").alias("n_rows"),
            F.coalesce(F.col(f"__null{i}"), F.lit(0)).alias("n_null"),
            F.col(f"__dist{i}").alias("n_distinct"),
            F.col(f"__min{i}").alias("min_value"),
            F.col(f"__max{i}").alias("max_value"),
        )
        for i, c in enumerate(cols)
    ]
    return agged.select(F.explode(F.array(*rows)).alias("__p")).select("__p.*")
