"""Type-2 slowly-changing-dimension (SCD2) history from a change stream.

The mirror operators (`operators/mirror.py`) maintain CURRENT state —
upsert + retain, reference sync-app/src/sync.rs. A warehouse additionally
keeps the history: one row per (key, version) with a validity interval,
closed by the next change. This operator derives that table from an
append-only change stream in two window passes over ONE partitioning:

1. collapse no-op changes — a row opens a new version only when its
   tracked attributes differ from the previous row of the same key
   (`lag` over (key, ts)); consecutive identical snapshots collapse, so
   replaying the same feed is idempotent;
2. close intervals — `valid_to` = the next surviving version's
   `valid_from` (`lead`), NULL for the current row.

Both windows share the (key) partitioning and (ts, tiebreak) sort, so the
whole derivation is one shuffle; at 100 TB the change stream is typically
already bucketed by key and the Exchange disappears entirely (the
bucketed-mirror pattern, `TestBucketedMirror`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, attrs, valid_from, valid_to, version, is_current) — one row
    per surviving version. `tiebreak_col` makes same-timestamp changes
    deterministic (last one under the tiebreak order wins the instant: the
    earlier row becomes a zero-length interval, matching how a warehouse
    load of an intraday feed behaves)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # row_number (not lag-is-null) flags the first row: a NULL first
    # attribute would make lag-based detection miss it under eqNullSafe
    is_first = F.row_number().over(w) == F.lit(1)

    versions = changes.withColumn(
        "__open", is_first | changed
    ).filter(F.col("__open"))

    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col, *attr_cols, "valid_from", "valid_to", "version", "is_current"
        )
    )
