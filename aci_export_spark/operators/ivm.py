"""Incremental view maintenance (IVM) for distributive aggregates.

The reference re-exports full query results every sync run
(`sync-app/src/sync.rs:541-590` recomputes the member set from scratch);
at 100 TB a nightly full recompute of a per-key aggregate is the single
most expensive job in the lake.  Distributive aggregates (COUNT, SUM, and
insert-only MIN/MAX) admit exact incremental maintenance: keep the
materialized aggregate, aggregate ONLY the day's delta, and merge the two
partial-aggregate tables on the group key.  Cost drops from O(|base facts|)
to O(|materialized view| + |delta|) — the view is group-cardinality-sized,
orders of magnitude smaller than the fact table it summarizes.

Delete/update deltas are handled with signed weights (+1 insert, -1
delete; an update is a -1/+1 pair): COUNT and SUM subtract exactly.
MIN/MAX are NOT incrementally maintainable under deletes (retracting the
current max needs the runner-up, which the view no longer has) — callers
must either restrict max columns to insert-only streams or fall back to
re-aggregation for affected groups; `merge_partials` enforces this by
refusing max columns when the delta carries negative weights.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggregate(
    facts: DataFrame,
    keys: Sequence[str],
    count_col: str,
    sum_cols: dict[str, str],
    max_cols: Optional[dict[str, str]] = None,
    weight_col: Optional[str] = None,
) -> DataFrame:
    """One partial-aggregate table: `keys` → signed count, signed sums,
    (unsigned) maxes.  With `weight_col` set, count/sum partials are
    weighted so a -1 row retracts a prior insert exactly."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    aggs = [F.sum(w).cast("long").alias(count_col)]
    for out, src in sum_cols.items():
        aggs.append(F.sum(F.col(src) * w).alias(out))
    for out, src in (max_cols or {}).items():
        aggs.append(F.max(src).alias(out))
    return facts.groupBy(*keys).agg(*aggs)


def merge_partials(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_col: str,
    sum_cols: Sequence[str],
    max_cols: Sequence[str] = (),
    delta_has_retractions: bool = False,
) -> DataFrame:
    """Merge a materialized partial-aggregate view with a delta partial:
    full-outer join on the group key, add counts/sums (NULL ≡ absent ≡ 0),
    greatest() for insert-only maxes; groups whose merged count reaches 0
    vanish (a fully-retracted group must not linger as an all-NULL row).

    The join is MV-sized, not fact-table-sized — this is the whole point.
    Both sides arrive pre-aggregated, so AQE sees two small keyed inputs
    and the merge re-uses the delta aggregation's hash partitioning.
    """
    if delta_has_retractions and max_cols:
        raise ValueError(
            "MIN/MAX cannot be incrementally maintained under deletes; "
            "re-aggregate affected groups instead"
        )
    b = base.select(
        *keys,
        F.col(count_col).alias("__bc"),
        *[F.col(c).alias(f"__bs_{c}") for c in sum_cols],
        *[F.col(c).alias(f"__bm_{c}") for c in max_cols],
    )
    d = delta.select(
        *keys,
        F.col(count_col).alias("__dc"),
        *[F.col(c).alias(f"__ds_{c}") for c in sum_cols],
        *[F.col(c).alias(f"__dm_{c}") for c in max_cols],
    )
    merged = b.join(d, on=list(keys), how="full_outer")
    out = merged.select(
        *keys,
        (F.coalesce("__bc", F.lit(0)) + F.coalesce("__dc", F.lit(0))).alias(count_col),
        *[
            (
                F.coalesce(F.col(f"__bs_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__ds_{c}"), F.lit(0))
            ).alias(c)
            for c in sum_cols
        ],
        *[
            F.greatest(F.col(f"__bm_{c}"), F.col(f"__dm_{c}")).alias(c)
            for c in max_cols
        ],
    )
    return out.filter(F.col(count_col) != 0)
