"""As-of (point-in-time) join.

The reference approximates as-of semantics with an interval filter + argmax
(`ddb/src/leadership.rs:95-122` + `ddb/src/members.rs:421-430`). Here it is a
first-class operator with the *scalable* Spark formulation: union both sides
with a side tag, one shuffle on the join key, and a single window pass that
forward-fills the latest right-side row onto each left row.

Why not join+filter+argmax? That materializes every (left, right-candidate)
pair before picking one — O(n·m) per key worst case. The union-window plan is
O((n+m) log(n+m)) per key with exactly one shuffle and no intermediate blowup,
which is the formulation that survives 100 TB (both sides stream through a
single sort-merge partition per key; no skewed pair explosion).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Columns injected during the union pass.
_SIDE, _TS = "__asof_side", "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    how: str = "left",
    strict: bool = False,
    right_tie: str | None = None,
) -> DataFrame:
    """For each left row: attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) on the same key.

    right_payload: right columns carried onto the output (must not collide
    with left column names — rename beforehand).
    right_tie: deterministic pick among right rows sharing (key, right_ts);
    the row with the greatest tie value wins. Defaults to the first payload
    column.
    how: "left" keeps unmatched left rows (payload nulls), "inner" drops them.
    """
    key = list(key)
    tie = right_tie or right_payload[0]

    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(0 if strict else 1))
    r = (
        right.select(
            *key, F.col(right_ts).alias(_TS), *[F.col(c) for c in right_payload]
        )
        # strict: right at ts==t must NOT be visible to left at t → sort after
        .withColumn(_SIDE, F.lit(1 if strict else 0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(tie).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col(_SIDE) == (1 if strict else 0), F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__m_{c}")
            for c in right_payload
        ],
    )

    out = filled.filter(F.col(_SIDE) == (0 if strict else 1)).drop(
        _SIDE, _TS, *right_payload
    )
    for c in right_payload:
        out = out.withColumnRenamed(f"__m_{c}", c)
    if how == "inner":
        out = out.filter(F.col(right_payload[0]).isNotNull())
    return out


def latest_per_key_ts(
    df: DataFrame, key: Sequence[str], ts: str, tie: str
) -> DataFrame:
    """Collapse rows sharing (key, ts) to one, keeping MAX(tie) — makes the
    right side of an as-of join deterministic (SURVEY §7.4.1 tie policy)."""
    w = Window.partitionBy(*key, ts).orderBy(F.col(tie).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
