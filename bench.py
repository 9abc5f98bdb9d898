"""Benchmark harness (driver contract, see repo instructions).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed via the noop sink (whole plan runs, nothing
collects to the driver — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from aci_export_spark.session import get_spark
    from aci_export_spark import harness

    spark = get_spark("aci-export-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()  # pull in llm/temporal harness modules

    # warm the JVM/codegen once so per-query numbers measure the plan, not
    # first-run classloading
    harness.flagship_scoped_members(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # fork the Python/Arrow worker daemons up front (one per core) so the
    # first mapInPandas/pandas-UDF query isn't billed ~2s of worker spawn
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in sorted(harness.REGISTRY.items()):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
