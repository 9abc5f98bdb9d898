"""A/B mini-sweep: run a subset of registered queries interleaved (like
bench.py) under two session configurations and compare wall/CPU totals.

Usage: python scripts/absweep.py [n_queries] [reps]

Config B is taken from SPARK_GRAFT_AB_CONF ("k=v,k=v"). Each arm runs in
its own subprocess so sessions don't share JVMs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ARM = os.environ.get("SPARK_GRAFT_AB_ARM")


def run_arm(n: int, reps: int, conf: dict[str, str]) -> dict:
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _tree_cpu_seconds
    from aci_export_spark.session import get_spark
    from aci_export_spark import harness, harness_llm, artifacts

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("absweep", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()
    harness.flagship_scoped_members(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.range(1).toPandas()

    names = harness._bench_ordered_names()[:n]
    walls: dict[str, list[float]] = {k: [] for k in names}
    cpus: dict[str, list[float]] = {k: [] for k in names}
    for _ in range(reps):
        artifacts._CACHE.clear()
        harness_llm._KMEANS_MODEL_CACHE.clear()
        harness_llm._PQ_CODEBOOK_CACHE.clear()
        harness_llm._FIT_SAMPLE_CACHE.clear()
        for name in names:
            c0, t0 = _tree_cpu_seconds(), time.perf_counter()
            harness.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(time.perf_counter() - t0)
            cpus[name].append(max(0.0, _tree_cpu_seconds() - c0))
    from statistics import median

    out = {
        "wall": {k: round(median(v), 3) for k, v in walls.items()},
        "cpu": {k: round(median(v), 3) for k, v in cpus.items()},
    }
    out["total_wall"] = round(sum(out["wall"].values()), 2)
    out["total_cpu"] = round(sum(out["cpu"].values()), 2)
    spark.stop()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if ARM is not None:
        conf = {}
        for kv in os.environ.get("SPARK_GRAFT_AB_CONF", "").split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                conf[k.strip()] = v.strip()
        print(json.dumps(run_arm(n, reps, conf if ARM == "B" else {})))
        return
    env = dict(os.environ)
    results = {}
    for arm in ("A", "B"):
        env["SPARK_GRAFT_AB_ARM"] = arm
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n), str(reps)],
            env=env, capture_output=True, text=True,
        )
        line = p.stdout.strip().split("\n")[-1]
        results[arm] = json.loads(line)
        print(
            f"arm {arm}: total_wall={results[arm]['total_wall']} "
            f"total_cpu={results[arm]['total_cpu']}"
        )
    a, b = results["A"], results["B"]
    print("\nper-query deltas (B-A) worth noting (|dwall| > 0.15s):")
    for k in a["wall"]:
        dw = b["wall"][k] - a["wall"][k]
        dc = b["cpu"][k] - a["cpu"][k]
        if abs(dw) > 0.15:
            print(f"  {k:<42} wall {a['wall'][k]:6.2f} -> {b['wall'][k]:6.2f}  cpu {a['cpu'][k]:6.1f} -> {b['cpu'][k]:6.1f}")


if __name__ == "__main__":
    main()
