"""Range (interval-containment) joins.

Not present in the reference (its date-window logic is a filter against NOW,
`ddb/src/members.rs:344-345,393-395`); first-class here because interval
containment against a fact stream is a core analytics primitive.

Two physical strategies, chosen by whether an equi-key exists:

- `keyed_range_join`: equi-join on the key, then the range predicate as a
  post-join filter. Catalyst executes the equi part as a hash/sort-merge join,
  so the range filter only sees same-key candidates — linear in practice.
- `bucketed_range_join`: no equi-key. A naive theta-join is a broadcast
  nested loop (O(n·m) — dead at scale). Instead each interval explodes into
  the coarse time buckets it covers, facts map to their single bucket, and an
  equi-join on bucket + exact range filter runs. Cost is
  O(n + m·avg_buckets_per_interval) shuffle rows — the standard trick for
  interval joins on large data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    key: Sequence[str],
    fact_ts: str,
    start: str,
    end: str,
    how: str = "inner",
) -> DataFrame:
    """facts ⋈ intervals on equal key AND start <= fact_ts <= end."""
    cond = None
    for k in list(key):
        c = facts[k] == intervals[k]
        cond = c if cond is None else (cond & c)
    cond = cond & (facts[fact_ts] >= intervals[start]) & (facts[fact_ts] <= intervals[end])
    return facts.join(intervals, cond, how)


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Keyless interval join via coarse time-bucket equi-join.

    Each fact lands in exactly one bucket, so a (fact, interval) pair matches
    at most once — no post-join dedup needed. Pick bucket_seconds near the
    typical interval length: too small explodes the interval side, too large
    degrades selectivity of the equi-join.
    """
    b_us = bucket_seconds * 1_000_000
    # `div` (integer division) keeps full precision on ~1e18 microsecond
    # values; a double-based floor would lose low bits past 2^53
    # cast NTZ→TIMESTAMP before unix_micros (same cast on both sides, so
    # bucket alignment is timezone-consistent)
    def _bucket(col: str) -> str:
        return f"unix_micros(cast({col} as timestamp)) div {b_us}"

    f = facts.withColumn("__b", F.expr(_bucket(fact_ts)))
    i = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.expr(_bucket(start)), F.expr(_bucket(end)))),
    )
    joined = f.join(i, on="__b", how="inner").filter(
        (F.col(fact_ts) >= F.col(start)) & (F.col(fact_ts) <= F.col(end))
    )
    return joined.drop("__b")
