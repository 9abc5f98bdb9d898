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


def _tree_cpu_seconds() -> float:
    """Total CPU-seconds consumed so far by this process TREE: the driver
    python, the JVM it spawned, and every pyspark daemon/worker under it —
    summed from /proc/<pid>/stat (utime+stime of live tree members plus
    cutime+cstime so reaped children keep counting).

    Why this and not the Spark status API: executorCpuTime only meters JVM
    task threads, so Python-heavy stages (mapInPandas, pandas UDFs) would
    under-report; the /proc tree catches both sides. And unlike wall time,
    CPU time does not inflate when sandbox neighbors steal the cores — two
    of the last three rounds' wall totals were contention-polluted (r7
    verdict #1), so per-query CPU is the number regressions are judged on.
    """
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    ppid: dict[int, int] = {}
    ticks: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                s = f.read().decode("ascii", "replace")
        except OSError:
            continue  # raced a process exit
        # comm may contain spaces/parens: fields resume after the last ')'
        rest = s[s.rindex(")") + 2 :].split()
        pid = int(d)
        ppid[pid] = int(rest[1])
        ticks[pid] = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
    total = 0
    for pid, t in ticks.items():
        p = pid
        while p > 1:
            if p == me:
                total += t
                break
            p = ppid.get(p, 0)
    return total / tick


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
    # ...and the driver-side Arrow collect path (first toPandas in a process
    # pays ~1.5s of one-time init that would otherwise bill to one query)
    spark.range(1).toPandas()

    # Median of N interleaved repetitions per query: one contended rep (GC,
    # sandbox neighbors, page cache) can no longer inflate a query's number —
    # round 3 recorded a uniform 1.75× on byte-identical code from exactly
    # that. Reps are interleaved (full sweep, then repeat) so a transient
    # stall decorrelates from any single query.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in harness.REGISTRY}
    cpu_samples: dict[str, list[float]] = {name: [] for name in harness.REGISTRY}
    from aci_export_spark import harness_llm

    from aci_export_spark import artifacts

    for _ in range(reps):
        # reset cross-call artifact caches (near-dup pairs, CC components,
        # kmeans centroids) so every sweep pays the full build cost — within
        # a sweep the FIRST consumer pays it (pipeline semantics: artifacts
        # are built once per corpus snapshot), but reps 2..N must not hit a
        # previous sweep's cache or the median under-reports the real cost
        artifacts._CACHE.clear()
        harness_llm._KMEANS_MODEL_CACHE.clear()
        harness_llm._PQ_CODEBOOK_CACHE.clear()
        harness_llm._FIT_SAMPLE_CACHE.clear()
        # billing order (BENCH_BILLING_ORDER head, then registration order),
        # NOT the driver correctness window and NOT alphabetical: the head
        # places each shared artifact's PRODUCING query before its
        # audit/consumer queries, so per-query numbers attribute artifact
        # builds to their owners instead of whichever consumer sorts first
        # (pipeline semantics: the pair join runs once per corpus snapshot,
        # inside the query that publishes it). Frozen at the r7 order so
        # round-over-round diffs are attribution-stable.
        for name in harness._bench_ordered_names():
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            harness.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
            # clamp at 0: a pyspark worker orphaned between snapshots
            # (reparented to init) leaves the tree with its lifetime CPU,
            # which can push a raw delta slightly negative; the median
            # across reps absorbs the corresponding under-count
            cpu_samples[name].append(max(0.0, _tree_cpu_seconds() - c0))

    from statistics import median

    timings = {name: round(median(v), 3) for name, v in samples.items()}
    best = {name: round(min(v), 3) for name, v in samples.items()}
    cpu = {name: round(median(v), 3) for name, v in cpu_samples.items()}
    cpu_best = {name: round(min(v), 3) for name, v in cpu_samples.items()}

    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # Full per-query timings go to a file; the stdout line stays compact
    # (headline queries only) because the driver captures a bounded tail of
    # stdout — round 1's 68-query line overflowed it and parsed as null.
    full = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_best": best,
        # contention-immune companion metric (r7 verdict #1): process-tree
        # CPU-seconds per query (JVM + python workers). Wall >> cpu/cores on
        # a quiet box is scheduler wait, not engine work — compare cpu
        # round-over-round to separate machine noise from engine change.
        "queries_cpu": cpu,
        "queries_cpu_best": cpu_best,
        "value_cpu": round(sum(cpu.values()), 3),
        "reps": reps,
        "n_queries": len(timings),
        "sf": sf,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    headline = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q18_large_volume_customers", "flagship_scoped_members",
        "j1_wide_pivot_nullpad", "llm_dedup_exact", "llm_dedup_minhash_lsh",
        "llm_dedup_ngram_jaccard", "llm_dedup_simhash",
        "llm_dedup_embedding_cosine", "llm_sim_bruteforce_topk",
        "llm_sim_ivf_kmeans_topk", "llm_dedup_clusters",
        "llm_dedup_cluster_canonical", "llm_decontaminate_overlap",
        "llm_quality_gopher", "llm_boilerplate_spans", "llm_pack_sequences",
        "events_hourly_agg", "events_sessionization",
        "streaming_hourly_agg", "asof_click_to_view",
        "llm_dedup_semantic", "llm_repetition_signals",
        "er_fuzzy_name_pairs", "q6_forecast_revenue", "q21_waiting_suppliers",
    ]
    compact = dict(full)
    compact["queries"] = {k: timings[k] for k in headline if k in timings}
    compact["queries_cpu"] = {k: cpu[k] for k in headline if k in cpu}
    del compact["queries_best"]
    del compact["queries_cpu_best"]
    compact["queries_full"] = "BENCH_FULL.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
