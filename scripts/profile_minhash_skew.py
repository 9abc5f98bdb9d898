"""MinHash-LSH verify-join profile (SCALE.md evidence): band-bucket skew
and verify parallelism at sf0.1 vs the 10× stress corpus.

Answers two questions the 10× growth number alone cannot:

1. **Is candidate growth plan-bound or density-bound?** Reports band-bucket
   size distribution (max / p99 / mean) and candidate-pair counts at each
   LSH stage (raw band join → signature-agreement prefilter → size-ratio
   prefilter → verified). If bucket p99 stays O(1) while candidates grow
   ~linearly with true duplicate mass, the plan is healthy and the wall
   growth tracks duplicate density.
2. **Does `pin_join_parallelism` hold the verify join open?** Reports the
   task count of the verify stage (from the executed plan's shuffle
   partitioning) — the explicit keyed repartition must keep N tasks even
   though the candidate table is bytes-tiny.

Run after `scripts/stress10x.py` has synthesized `/tmp/stress10x`:

    python scripts/profile_minhash_skew.py
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG_DIR = os.environ.get("STRESS_OUT", "/tmp/stress10x")


def profile(spark, sf_dir: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from aci_export_spark.llm import dedup as D
    from aci_export_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sh = D.shingle_rows(docs, "doc_id", "text", n=5)
    hashed = D.hashed_shingle_rows(sh, "doc_id", "shingle")
    sig = (
        hashed.groupBy("doc_id")
        .agg(*[D._perm_min(i) for i in range(16)])
        .localCheckpoint()
    )
    banded = D.lsh_band_rows(sig, "doc_id", num_hashes=16, bands=4)
    bucket_sizes = banded.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = bucket_sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max"),
        F.expr("percentile_approx(n, 0.99)").alias("p99"),
        F.avg("n").alias("mean"),
    ).collect()[0]
    raw_cand = D.minhash_lsh_candidates(sig, "doc_id", 16, 4).count()

    t0 = time.perf_counter()
    pairs = D.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=16, bands=4,
        shingle_size=5,
    )
    n_verified = pairs.count()
    wall = time.perf_counter() - t0
    # verify parallelism: the explicit repartition in pin_join_parallelism
    # must survive into the executed plan (AQE never coalesces it)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    default_par = spark.sparkContext.defaultParallelism
    pinned = f"REPARTITION_BY_NUM, {default_par}" in plan or (
        f"hashpartitioning(id_a" in plan
    )
    out = {
        "label": label,
        "docs": n_docs,
        "buckets": stats["n_buckets"],
        "bucket_max": stats["max"],
        "bucket_p99": float(stats["p99"]),
        "bucket_mean": round(float(stats["mean"]), 3),
        "cand_raw": raw_cand,
        "verified": n_verified,
        "verify_pinned": pinned,
        "wall_s": round(wall, 2),
    }
    print(out, flush=True)
    return out


def main() -> None:
    from aci_export_spark.session import get_spark

    spark = get_spark("minhash-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.format("noop").mode("overwrite").save()
    base = profile(spark, SF_DIR, "sf0.1")
    big = profile(spark, BIG_DIR, "10x")
    print("\n| metric | sf0.1 | 10x | growth |")
    print("|---|---|---|---|")
    for k in ("docs", "buckets", "bucket_max", "bucket_p99", "cand_raw",
              "verified", "wall_s"):
        g = big[k] / base[k] if base[k] else float("nan")
        print(f"| {k} | {base[k]} | {big[k]} | {g:.2f}x |")
    print(f"| verify_pinned | {base['verify_pinned']} | {big['verify_pinned']} | — |")
    spark.stop()


if __name__ == "__main__":
    main()
