"""Gap-fill + LOCF operator (operators/gapfill.py): hand-computable fixture
semantics, carry correctness across multi-bucket gaps, tie determinism under
duplicate timestamps, and the grid-bounds contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aci_export_spark.operators.gapfill import gapfill_locf


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, day, hour, 0, 0)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, schema="k bigint, ts timestamp, v double, tie bigint"
    )
    out = gapfill_locf(
        df, key=["k"], ts_col="ts", value_col="v", tie_col="tie", grain="DAY"
    )
    return {
        (r["k"], r["bucket"].date().isoformat()): (
            r["n_events"], r["is_observed"], r["value_locf"], r["gap_age"]
        )
        for r in out.collect()
    }


def test_fills_gaps_and_carries_last_value(spark):
    got = _run(
        spark,
        [
            (1, _ts(1, 9), 10.0, 1),
            (1, _ts(1, 17), 11.0, 2),  # later same day wins
            (1, _ts(4, 8), 40.0, 3),  # 2-day gap before this
        ],
    )
    assert got == {
        (1, "2024-03-01"): (2, True, 11.0, 0),
        (1, "2024-03-02"): (0, False, 11.0, 1),
        (1, "2024-03-03"): (0, False, 11.0, 2),
        (1, "2024-03-04"): (1, True, 40.0, 0),
    }


def test_duplicate_timestamps_break_on_tie_column(spark):
    # same ts: the higher tie wins the bucket regardless of input order
    got = _run(spark, [(1, _ts(2), 5.0, 9), (1, _ts(2), 7.0, 10)])
    assert got == {(1, "2024-03-02"): (2, True, 7.0, 0)}
    got_rev = _run(spark, [(1, _ts(2), 7.0, 10), (1, _ts(2), 5.0, 9)])
    assert got_rev == got


def test_grid_is_per_key_and_never_leads_null(spark):
    got = _run(
        spark,
        [
            (1, _ts(1), 1.0, 1),
            (1, _ts(3), 3.0, 2),
            (2, _ts(5), 50.0, 3),  # key 2's grid starts at ITS first day
        ],
    )
    assert set(got) == {
        (1, "2024-03-01"), (1, "2024-03-02"), (1, "2024-03-03"),
        (2, "2024-03-05"),
    }
    # no row carries a NULL: every grid starts at an observed bucket
    assert all(v[2] is not None for v in got.values())
    assert got[(2, "2024-03-05")] == (1, True, 50.0, 0)


def test_single_event_key_is_one_observed_row(spark):
    got = _run(spark, [(7, _ts(10, 23), 9.5, 1)])
    assert got == {(7, "2024-03-10"): (1, True, 9.5, 0)}
