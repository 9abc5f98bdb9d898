"""Accuracy bounds for the sketch operators (HLL++ distinct, approximate
quantiles) against their exact counterparts — the check the rows-only driver
entries cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.sources import read_table
from tests.conftest import SF_CORRECT


def test_hll_distinct_within_rsd(spark):
    from aci_export_spark.harness_llm import events_sketch_distinct

    rows = events_sketch_distinct(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        exact, approx = r["exact_users"], r["approx_users"]
        # rsd 2%: allow 5 standard deviations of slack
        assert abs(approx - exact) <= max(5, 0.10 * exact), r


def test_approx_quantiles_within_rank_error(spark):
    from aci_export_spark.harness_llm import events_sketch_quantiles

    got = {r["event_type"]: r for r in events_sketch_quantiles(spark, SF_CORRECT).collect()}
    ev = read_table(spark, SF_CORRECT, "events")
    for etype, r in got.items():
        vals = sorted(
            x["value"] for x in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for q, approx in [(0.5, r["p50"]), (0.95, r["p95"]), (0.99, r["p99"])]:
            # approx must fall within ±1% rank error of the true quantile
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n))]
            assert lo <= approx <= hi, (etype, q, approx, lo, hi)
