"""Marketing-touch attribution over an event stream.

For each conversion, find the touches (channel events) by the same user
inside a trailing window and assign credit.  Linear (multi-touch) credit
is kept *rational*: each output row carries the exact integer pair
(channel touches, total touches) and the share as ONE IEEE division —
summing float shares across conversions would make the result depend on
aggregation order, so cross-conversion rollups are left to the caller on
the integer columns.

Plan shape: conversions and touches both key on the user — one shuffle
each onto the same hash partitioning, a per-user equi-join with the
window predicate applied inside the join (never a time-unbounded
cross of a user's history), then two aggregations that REUSE the
(conversion) partitioning.  Per-user touch fan-out is bounded by the
window; a user hot enough to matter is bounded by the same AQE skew
handling as any join."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: tuple[str, ...],
    window_days: int = 7,
) -> DataFrame:
    """(conversion id, channel, touches_n, total_n, share) rows: every
    channel that touched the user in the `window_days` before the
    conversion, with exact counts and linear share = touches_n/total_n."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("__cts"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("channel"),
        F.col(ts_col).alias("__tts"),
    )
    window_us = window_days * 86400 * 1_000_000
    in_window = (F.col("__tts") <= F.col("__cts")) & (
        F.unix_micros(F.col("__cts").cast("timestamp"))
        - F.unix_micros(F.col("__tts").cast("timestamp"))
        <= window_us
    )
    pairs = conv.join(touch, on="__u").filter(in_window)
    per_channel = pairs.groupBy("conversion_id", "channel").agg(
        F.count(F.lit(1)).cast("long").alias("touches_n")
    )
    totals = pairs.groupBy("conversion_id").agg(
        F.count(F.lit(1)).cast("long").alias("total_n")
    )
    return per_channel.join(totals, on="conversion_id").select(
        "conversion_id",
        "channel",
        "touches_n",
        "total_n",
        (F.col("touches_n").cast("double") / F.col("total_n").cast("double")).alias(
            "share"
        ),
    )
