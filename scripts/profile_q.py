"""Profile individual registered queries: wall + process-tree CPU per rep.

Usage: python scripts/profile_q.py name [name ...] [--reps N]

Same methodology as bench.py (noop sink, tree CPU from /proc) but standalone,
so one query can be iterated on without paying the 280-query sweep. Artifact
caches are cleared before EACH rep so every rep pays the full build cost
(matching the bench's per-sweep clearing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _tree_cpu_seconds  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aci_export_spark.session import get_spark
    from aci_export_spark import harness, harness_llm, artifacts

    spark = get_spark("profile-q")
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()

    # same warmup as bench.py
    harness.flagship_scoped_members(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.range(1).toPandas()

    for name in args:
        walls, cpus = [], []
        for _ in range(reps):
            artifacts._CACHE.clear()
            harness_llm._KMEANS_MODEL_CACHE.clear()
            harness_llm._PQ_CODEBOOK_CACHE.clear()
            harness_llm._FIT_SAMPLE_CACHE.clear()
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            harness.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.perf_counter() - t0)
            cpus.append(max(0.0, _tree_cpu_seconds() - c0))
        print(
            f"{name}: wall={['%.2f' % w for w in walls]} "
            f"cpu={['%.1f' % c for c in cpus]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
