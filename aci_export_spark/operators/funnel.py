"""Sequential conversion-funnel analysis over an event stream.

The classic product-analytics operator (and the reference's event-pipeline
counterpart to windowed rollups): for an ordered list of step types, find for
each user the first step-1 event, then the first step-2 event at-or-after it,
and so on — each user's timestamps are monotone along the funnel, and the
stage reached is how deep the chain got.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel timestamps: column ``t_<step>`` is the first `step`
    event at-or-after the previous step's timestamp (NULL once the chain
    breaks), plus ``stage_reached`` (0..len(steps)).

    Semantics are pure min-with-predicate per stage — "first view ≥ first
    signup" — so ties at the same timestamp count regardless of event order,
    and the whole operator is replayable as chained SQL aggregates.

    Plan shape: each stage is a type-filtered scan → groupBy(user) min →
    left join back, ALL keyed on the user column — after the first exchange
    every later aggregate and join re-uses the same hash partitioning, so a
    K-step funnel costs one corpus-wide shuffle plus K co-partitioned,
    already-reduced (one row per user) stages. The type filter is pushed to
    the scan; at 100 TB with the lake partitioned or z-ordered by event type
    each stage reads only its step's slice. Steps shrink monotonically
    (stage N joins semi-filter stage N+1's aggregate), which AQE exploits by
    downsizing the later joins at runtime.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    first = steps[0]
    out = (
        events.filter(F.col(type_col) == first)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{first}"))
    )
    prev = f"t_{first}"
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, prev), on=user_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        out = out.join(nxt, on=user_col, how="left")
        prev = f"t_{step}"
    stage = F.lit(0)
    for i, step in enumerate(steps):
        stage = F.when(F.col(f"t_{step}").isNotNull(), i + 1).otherwise(stage)
    # stage_reached counts the longest non-NULL prefix; NULLs are monotone by
    # construction (a later stage joins through the earlier one)
    return out.withColumn("stage_reached", stage)


def funnel_summary(per_user: DataFrame, steps: tuple[str, ...]) -> DataFrame:
    """Collapse per-user funnel rows to one row per step with the user count
    that reached it — the conversion report. Counting non-NULL step columns
    in ONE aggregate keeps it a single reduce to `len(steps)` values."""
    aggs = [
        F.count(F.col(f"t_{s}")).alias(f"n_{s}") for s in steps
    ]
    wide = per_user.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_no"),
                F.lit(s).alias("step"),
                F.col(f"n_{s}").cast("long").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.step_no", "r.step", "r.users"
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity day
    (the cohort), counted on each later day they return — the
    (cohort_day, day_offset, active_users, cohort_size) grid behind every
    retention curve.

    Plan: exactly TWO corpus-wide shuffles — the (user, day) distinct, then
    a user-key exchange for the window that stamps each activity row with
    its user's first day (the cohort). Everything after is dimension-sized:
    the (cohort, offset) grid counts rows directly (each user contributes
    at most one row per day, so count(*) IS distinct users), and cohort
    sizes fall out of the same stamped table (the rows where day ==
    cohort day) — no separate corpus aggregate, no count-distinct.
    """
    from pyspark.sql import Window

    day = F.to_date(F.col(ts_col))
    activity = events.select(F.col(user_col), day.alias("__day")).distinct()
    w = Window.partitionBy(user_col)
    stamped = activity.withColumn("cohort_day", F.min("__day").over(w))
    grid = stamped.groupBy(
        "cohort_day",
        F.datediff(F.col("__day"), F.col("cohort_day")).alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("active_users"))
    sizes = stamped.filter(F.col("__day") == F.col("cohort_day")).groupBy(
        "cohort_day"
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    return grid.join(F.broadcast(sizes), on="cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "active_users",
        "cohort_size",
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Daily + trailing-window active users (the DAU/WAU/MAU board metric):
    for each calendar day with activity, the distinct users that day and in
    the trailing `window_days` window ending that day.

    Exact formulation: each (user, day) activity row is exploded to the
    `window_days` window-end days it contributes to (a BOUNDED fan-out —
    7× or 28×, never data-dependent), then one distinct count per day.
    That is the standard exact plan; at 100 TB the approximate path is one
    HLL sketch per (user-shard, day) merged across the trailing window
    (`events_sketch_distinct` is the in-repo sketch primitive) — swap when
    the exact distinct's shuffle dominates. Window-end days are
    inner-joined to observed days so the metric stops at the data's edge
    instead of reporting phantom trailing days."""
    day = F.to_date(F.col(ts_col))
    activity = events.select(F.col(user_col), day.alias("__day")).distinct()
    dau = activity.groupBy(F.col("__day").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    cover = activity.select(
        F.col(user_col),
        F.explode(
            F.sequence(
                F.col("__day"), F.date_add(F.col("__day"), window_days - 1)
            )
        ).alias("day"),
    )
    wau = cover.groupBy("day").agg(
        F.count_distinct(F.col(user_col)).alias("wau")
    )
    return (
        dau.join(wau, on="day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
    )
