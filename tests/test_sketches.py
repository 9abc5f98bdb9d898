"""Accuracy bounds for the sketch operators (HLL++ distinct, approximate
quantiles). The harness queries now emit deterministic bound-check verdicts
(the estimate itself is engine-specific and stays out of the oracle hash);
these tests assert the verdicts hold and that the underlying estimates are
genuinely close to exact — the sharper statement the boolean compresses."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.sources import read_table
from tests.conftest import SF_CORRECT


def test_hll_distinct_within_rsd(spark):
    from aci_export_spark.harness_llm import events_sketch_distinct

    rows = events_sketch_distinct(spark, SF_CORRECT).collect()
    assert rows
    assert all(r["within_bound"] for r in rows), rows

    # the raw estimate really is within 5σ of the exact count
    ev = read_table(spark, SF_CORRECT, "events")
    raw = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()
    for r in raw:
        assert abs(r["approx"] - r["exact"]) <= max(5, 0.10 * r["exact"]), r


def test_approx_quantiles_within_rank_error(spark):
    from aci_export_spark.harness_llm import events_sketch_quantiles

    rows = events_sketch_quantiles(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r

    # independent re-derivation: the estimate must fall within ±1% rank
    # error of the true quantile (tighter than the query's documented 2%)
    ev = read_table(spark, SF_CORRECT, "events")
    approx = {
        r["event_type"]: r["q"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("q"))
        .collect()
    }
    for etype, qvals in approx.items():
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for q, est in zip((0.5, 0.95, 0.99), qvals):
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= est <= hi, (etype, q, est, lo, hi)


def test_countmin_never_underestimates_and_unions(spark):
    from aci_export_spark.operators.sketches import countmin_build, countmin_estimate

    rows = [(f"k{i % 20}",) for i in range(400)]  # skewed: k0..k19, 20 each
    df = spark.createDataFrame(rows, "key string")
    counters = countmin_build(df, "key", width=16, depth=3)  # tiny → collisions
    keys = df.distinct()
    est = {
        r["key"]: r["cms_estimate"]
        for r in countmin_estimate(keys, counters, "key", width=16, depth=3).collect()
    }
    assert all(v >= 20 for v in est.values())  # never underestimates
    # an absent key estimates from whatever collided into its buckets — may
    # be positive, never negative
    ghost = spark.createDataFrame([("nope",)], "key string")
    g = countmin_estimate(ghost, counters, "key", width=16, depth=3).collect()[0]
    assert g["cms_estimate"] >= 0
    # grid is bounded
    assert counters.count() <= 16 * 3
