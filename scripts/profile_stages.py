"""Stage-level CPU attribution for one registered query.

Usage: python scripts/profile_stages.py <query_name> [--reps N]

Runs the query (noop sink) in a fresh session with the Spark event log
enabled, then parses the log: per-stage executorRunTime / executorCpuTime /
task count / shuffle bytes, sorted by CPU. Stage names come from the
callsite, which maps back to the operator. JVM-side only (Python worker CPU
is invisible to task metrics — compare with profile_q.py's tree CPU to see
the Python share).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = 1
    for a in sys.argv[2:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark-ev-")

    from aci_export_spark.session import get_spark
    from aci_export_spark import harness, harness_llm, artifacts

    spark = get_spark(
        "profile-stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()
    # warmup (codegen/classloading) — same as bench
    harness.flagship_scoped_members(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    import pandas as _pd  # noqa: F401

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.range(1).toPandas()

    # mark the profiled region with job-group boundaries via a sentinel job
    spark.sparkContext.setJobDescription("__profile_start__")
    spark.range(1).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)

    from bench import _tree_cpu_seconds

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
        print(
            f"rep: wall={time.perf_counter() - t0:.2f} "
            f"tree_cpu={_tree_cpu_seconds() - c0:.1f}"
        )
    spark.stop()

    # parse the event log (v2 rolling layout writes a directory)
    logf = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if not f.startswith("appstatus") and not f.startswith("."):
                logf.append(os.path.join(root, f))
    assert len(logf) == 1, logf
    stages = {}  # id -> dict
    in_region = False
    job_of_stage = {}
    with open(logf[0]) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                if desc == "__profile_start__":
                    in_region = True
                    continue
                for si in ev.get("Stage Infos", []):
                    job_of_stage[si["Stage ID"]] = in_region
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                if not job_of_stage.get(sid):
                    continue
                ent = stages.setdefault(
                    sid,
                    {
                        "name": "",
                        "tasks": 0,
                        "run_ms": 0,
                        "cpu_ms": 0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "details": "",
                    },
                )
                ent["name"] = si.get("Stage Name", "")[:70]
                ent["tasks"] = si.get("Number of Tasks")
                ent["details"] = (si.get("Details") or "").split("\n")[0][:120]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                if sid not in stages and job_of_stage.get(sid):
                    stages[sid] = {
                        "name": "?",
                        "tasks": 0,
                        "run_ms": 0,
                        "cpu_ms": 0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "details": "",
                    }
                if sid not in stages:
                    continue
                m = ev.get("Task Metrics") or {}
                stages[sid]["run_ms"] += m.get("Executor Run Time", 0)
                stages[sid]["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                stages[sid]["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                stages[sid]["sh_write"] += sw.get("Shuffle Bytes Written", 0)

    total_cpu = sum(s["cpu_ms"] for s in stages.values())
    total_run = sum(s["run_ms"] for s in stages.values())
    print(f"\n{len(stages)} stages, total run {total_run/1000:.1f}s, "
          f"total jvm-cpu {total_cpu/1000:.1f}s (reps={reps})")
    print(f"{'sid':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} "
          f"{'shR_kB':>8} {'shW_kB':>8}  callsite")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["run_ms"])[:40]:
        print(
            f"{sid:>5} {s['tasks']:>5} {s['run_ms']/1000:>7.2f} "
            f"{s['cpu_ms']/1000:>7.2f} {s['sh_read']//1024:>8} "
            f"{s['sh_write']//1024:>8}  {s['name']}"
        )
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
