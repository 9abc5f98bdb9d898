"""Kaplan-Meier life table (operators/survival.py) and the deterministic
Poisson bootstrap (operators/bootstrap.py): hand-computed life-table
agreement, censoring semantics, ppm arithmetic; bootstrap weight law,
determinism, and CI ordering."""

from __future__ import annotations

from aci_export_spark.operators.bootstrap import (
    POISSON1_CDF_T60,
    poisson_bootstrap_ci,
)
from aci_export_spark.operators.survival import km_life_table, user_lifetimes

PPM = 1_000_000


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------


def _lifetimes_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, duration_days long, censored boolean"
    )


def test_km_matches_hand_computed_life_table(spark):
    """The textbook example: 10 subjects, deaths at t=2 (x2), 5, 8;
    censored at 3, 5, 9; survivors censored late."""
    rows = [
        (1, 2, False), (2, 2, False), (3, 5, False), (4, 8, False),
        (5, 3, True), (6, 5, True), (7, 9, True),
        (8, 10, True), (9, 10, True), (10, 12, True),
    ]
    out = {
        int(r["duration_days"]): r
        for r in km_life_table(_lifetimes_df(spark, rows)).collect()
    }
    assert set(out) == {2, 5, 8}
    # t=2: all 10 at risk, 2 deaths
    assert out[2]["n_risk"] == 10 and out[2]["n_deaths"] == 2
    assert out[2]["hazard_ppm"] == 2 * PPM // 10
    assert out[2]["km_factor_ppm"] == 8 * PPM // 10
    # t=5: risk set excludes the 2 deaths and the t=3 censor -> 7;
    # 1 death, 1 censored AT 5 (still at risk at 5)
    assert out[5]["n_risk"] == 7 and out[5]["n_deaths"] == 1
    assert out[5]["n_censored"] == 1
    assert out[5]["hazard_ppm"] == PPM // 7
    # t=8: risk = 10 - 2 - 1 - 1 - 1 = 5
    assert out[8]["n_risk"] == 5
    # Nelson-Aalen accumulates
    assert out[8]["cum_hazard_ppm"] == (
        out[2]["hazard_ppm"] + out[5]["hazard_ppm"] + out[8]["hazard_ppm"]
    )


def test_km_censored_only_times_emit_no_row(spark):
    rows = [(1, 4, True), (2, 4, True), (3, 6, False)]
    out = km_life_table(_lifetimes_df(spark, rows)).collect()
    assert [int(r["duration_days"]) for r in out] == [6]
    assert out[0]["n_risk"] == 1  # both t=4 censors left the risk set by 6


def test_user_lifetimes_censoring_window(spark):
    import datetime as dt

    rows = [
        # active long ago, gone well before the horizon: observed death
        (1, dt.datetime(2025, 1, 1), ),
        (1, dt.datetime(2025, 1, 11), ),
        # last seen 2 days before horizon: censored
        (2, dt.datetime(2025, 1, 1), ),
        (2, dt.datetime(2025, 1, 29), ),
        # horizon definer
        (3, dt.datetime(2025, 1, 31), ),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {int(r["user_id"]): r for r in user_lifetimes(df, censor_window_days=7).collect()}
    assert out[1]["duration_days"] == 10 and not out[1]["censored"]
    assert out[2]["duration_days"] == 28 and out[2]["censored"]
    assert out[3]["duration_days"] == 0 and out[3]["censored"]


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------


def _events_df(spark, n=400):
    return spark.createDataFrame(
        [(i, "t", float(i % 7)) for i in range(n)],
        "event_id long, event_type string, value double",
    )


def test_bootstrap_thresholds_are_monotone_poisson1():
    import math

    assert list(POISSON1_CDF_T60) == sorted(POISSON1_CDF_T60)
    # threshold k replays floor(P(X<=k) * 2^60) for Poisson(1)
    e = math.exp(-1)
    cum, fact = 0.0, 1
    for k, t in enumerate(POISSON1_CDF_T60):
        if k > 0:
            fact *= k
        cum += e / fact
        assert t == int(cum * (1 << 60))


def test_bootstrap_deterministic_and_brackets_point(spark):
    df = _events_df(spark)
    a = poisson_bootstrap_ci(df, "event_type", "event_id", "value").collect()
    b = poisson_bootstrap_ci(df, "event_type", "event_id", "value").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    r = a[0]
    assert r["n_events"] == 400
    assert r["boot_lo_cents"] <= r["boot_hi_cents"]
    # Poisson(1) weights have mean 1: replicate totals straddle the point
    assert r["boot_lo_cents"] < r["cents_total"] < r["boot_hi_cents"]


def test_bootstrap_weight_law_empirically_poisson1(spark):
    """Mean weight over rows x reps ~ 1 (md5 uniforms against the exact
    CDF thresholds): with 400*32 draws the sample mean is within 3%."""
    from pyspark.sql import functions as F

    from aci_export_spark.operators.bootstrap import _u60

    df = _events_df(spark).withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(32)))
    ).withColumn("u", _u60(F.col("rep"), F.col("event_id"), "boot:v1"))
    w = F.lit(0).cast("long")
    for t in POISSON1_CDF_T60:
        w = w + F.when(F.col("u") >= F.lit(t), 1).otherwise(0).cast("long")
    mean_w = df.select(F.avg(w).alias("m")).collect()[0]["m"]
    assert 0.97 < mean_w < 1.03
