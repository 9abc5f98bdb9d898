"""Snapshot diff: row-level reconciliation of two versions of a keyed
table — the audit primitive behind mirror verification, CDC backfill
checks, and "what changed between yesterday's and today's lake snapshot".

One full-outer join on the key produces the complete change set:
  - key only in new   → added
  - key only in old   → removed
  - both, any compared column differing (null-safely) → changed, with the
    exact changed-column list
Unchanged rows are dropped in the same pass — the output is delta-sized,
which is what makes the op usable at 100 TB: the join shuffles both
snapshots once on the key (or zero times when both sides are bucketed by
key, the mirror-table layout), and everything downstream is proportional
to the churn rate, not the table.

Complements `operators/mirror.py` (which APPLIES changes) by *detecting*
them — reference parity: the reference trusts its full re-export to be
the truth (`sync-app/src/sync.rs:541-590`); this operator is how you
check that claim without re-exporting.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """(keys…, change_type, changed_cols) for every added / removed /
    changed row between two snapshots.  `changed_cols` is a comma-joined
    sorted column list ('' for added/removed)."""
    keys = list(key_cols)
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    # null-safe per-column difference flags
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        ).otherwise(F.lit(None))
        for c in sorted(compare_cols)
    ]
    changed_cols = F.array_join(
        F.filter(F.array(*diffs), lambda x: x.isNotNull()), ","
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
        .otherwise(F.lit(None))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change_type") == "changed", changed_cols).otherwise(
                F.lit("")
            ),
        )
        .select(*keys, "change_type", "changed_cols")
    )
