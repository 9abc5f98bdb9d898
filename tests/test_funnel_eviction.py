"""Watermark eviction for the foreachBatch funnel's pending-candidate state
(r7 verdict #7): state must be bounded on unbounded streams, and the
evicting funnel must be row-identical to the exact one whenever no event
arrives later than the allowed-lateness horizon."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aci_export_spark.operators.funnel import funnel_steps
from aci_export_spark.streaming.core import FUNNEL_STEPS, funnel_foreach_batch


def _chunks_to_stream(spark, tmp_path, chunks, name):
    root = str(tmp_path / name)
    os.makedirs(root)
    schema = "user_id long, ts timestamp, event_type string"
    for i, rows in enumerate(chunks):
        spark.createDataFrame(
            [(u, t, e) for (u, t, e) in rows],
            "user_id long, ts_s string, event_type string",
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
        ).coalesce(1).write.parquet(f"{root}/c{i}")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/c*")
    )


def _final_rows(df):
    return sorted(
        (
            r["user_id"],
            *[
                None if r[f"t_{s}"] is None else str(r[f"t_{s}"])
                for s in FUNNEL_STEPS
            ],
            r["stage_reached"],
        )
        for r in df.collect()
    )


def _t(s):
    return f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}"


def test_eviction_equals_exact_when_lateness_respected(spark, tmp_path):
    """Out-of-order arrivals WITHIN the horizon (late signup promoting an
    earlier-buffered view) must still promote — eviction only drops what
    the contract says can no longer matter."""
    chunks = [
        [(1, _t(100), "signup"), (1, _t(98), "view"), (2, _t(10), "view")],
        # batch max so far 100; horizon 100-60=40: user 2's view@10 evicted,
        # user 1's view@98 retained and promoted by the signup@95 below
        [(1, _t(95), "signup"), (3, _t(110), "signup"), (3, _t(112), "view")],
        [(3, _t(111), "click"), (1, _t(99), "click")],
    ]
    stream = _chunks_to_stream(spark, tmp_path, chunks, "within")
    got = funnel_foreach_batch(stream, spark, allowed_lateness_s=60.0)

    # exact replay: user 2 never signs up, so dropping its view changes
    # nothing — the evicting result must equal the full batch recompute
    all_ev = spark.createDataFrame(
        [(u, ts, e) for c in chunks for (u, ts, e) in c],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    want = funnel_steps(all_ev, FUNNEL_STEPS)
    assert _final_rows(got) == _final_rows(want)
    row = {r["user_id"]: r for r in got.collect()}
    assert str(row[1]["t_signup"]).endswith("01:35")  # 95s
    assert str(row[1]["t_view"]).endswith("01:38")  # 98s promoted
    assert str(row[1]["t_click"]).endswith("01:39")


def test_pending_state_is_bounded_for_never_signup_users(spark, tmp_path):
    """A user that never signs up keeps emitting pre-signup activity; with
    a lateness horizon those candidates are evicted as event time advances,
    instead of accumulating forever. Without the horizon they all stay."""
    chunks = [
        [(9, _t(i * 30 + j), "view") for j in (0, 5)] + [(1, _t(i * 30), "signup")]
        for i in range(6)  # event time advances 30 s per batch
    ]
    # bounded: horizon = max_ts - 45 s keeps at most ~2 batches of views
    out_b = {}
    funnel_foreach_batch(
        _chunks_to_stream(spark, tmp_path, chunks, "bounded"),
        spark,
        allowed_lateness_s=45.0,
        state_out=out_b,
    )
    pend_b = out_b["pending"].filter(F.col("user_id") == 9).collect()
    assert 0 < len(pend_b) <= 4, [str(r["ts"]) for r in pend_b]
    assert all(str(r["ts"]) >= "2024-01-01 00:01:45" for r in pend_b)  # 150-45
    assert str(out_b["max_ts"]).startswith("2024-01-01 00:02:35")  # 155 s

    # unbounded control: every one of the 12 views is still pending
    out_u = {}
    funnel_foreach_batch(
        _chunks_to_stream(spark, tmp_path, chunks, "unbounded"),
        spark,
        state_out=out_u,
    )
    assert out_u["pending"].filter(F.col("user_id") == 9).count() == 12
    assert out_u["max_ts"] is None  # the clock is only tracked when evicting


def test_contract_violator_lands_lower_slot(spark, tmp_path):
    """An event LATER than the horizon (contract violation) may be dropped:
    the documented trade. view@10 is buffered, evicted once the clock
    passes 10+lateness, and the too-late signup@5 then cannot promote it —
    the user shows signup-only instead of the offline-exact signup+view."""
    chunks = [
        [(7, _t(10), "view"), (8, _t(200), "signup")],  # clock -> 200
        [(7, _t(5), "signup")],  # violates the 60 s contract (200-60 > 5)
    ]
    stream = _chunks_to_stream(spark, tmp_path, chunks, "violate")
    got = funnel_foreach_batch(stream, spark, allowed_lateness_s=60.0)
    row = {r["user_id"]: r for r in got.collect()}
    assert str(row[7]["t_signup"]).endswith("00:05")
    assert row[7]["t_view"] is None  # evicted before the violator arrived
    assert row[7]["stage_reached"] == 1
