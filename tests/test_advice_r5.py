"""Regression tests for the round-5 ADVICE findings: BPE backslash literals
(covered in test_bpe.py), BM25 tf persist leak, artifact-cache eviction, and
the spread_for_explode large-file guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aci_export_spark import artifacts
from aci_export_spark.llm import dedup as D


def test_parse_bytes_spark_conf_forms():
    assert D._parse_bytes("134217728b") == 134217728
    assert D._parse_bytes("134217728") == 134217728
    assert D._parse_bytes("128m") == 128 << 20
    assert D._parse_bytes("128MB") == 128 << 20
    assert D._parse_bytes("1g") == 1 << 30
    assert D._parse_bytes("4k") == 4 << 10


def test_spread_for_explode_leaves_large_splittable_files_alone(spark, tmp_path):
    """A scan of FEW but LARGE splittable files already has ≥ parallelism
    actual partitions (maxPartitionBytes splits), so the guard must not
    bounce it through a repartition shuffle (the round-5 ADVICE finding:
    counting inputFiles() alone inverted the 'no-op on real scans' intent
    for large-file layouts)."""
    p = str(tmp_path / "wide.parquet")
    spark.range(0, 20000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).coalesce(1).write.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # tiny split size => the single file implies >> parallelism splits
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4k")
        df = spark.read.parquet(p)
        assert len(df.inputFiles()) < spark.sparkContext.defaultParallelism
        assert D.spread_for_explode(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_for_explode_still_spreads_narrow_scans(spark, tmp_path):
    p = str(tmp_path / "narrow.parquet")
    spark.range(0, 10).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = D.spread_for_explode(df)
    assert out is not df  # tiny single file: must take the repartition


def test_shared_df_evicts_stale_app_entries(spark):
    app = spark.sparkContext.applicationId
    stale_key = ("app-long-gone-0000", "some_artifact", "sf0")
    artifacts._CACHE[stale_key] = spark.range(1)
    try:
        out = artifacts.shared_df(
            spark, ("advice_r5_probe",), lambda: spark.range(3), materialize=False
        )
        assert out.count() == 3
        assert stale_key not in artifacts._CACHE
        assert (app, "advice_r5_probe") in artifacts._CACHE
    finally:
        artifacts._CACHE.pop((app, "advice_r5_probe"), None)


def test_mlt_bm25_no_pinned_cache_entries(spark):
    """mlt_bm25_topk must not leave CacheManager-pinned tables behind
    (persist-without-unpersist leaked one corpus-sized cached table per
    call)."""
    from aci_export_spark.llm.retrieval import mlt_bm25_topk

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} alpha") for i in range(30)],
        schema="doc_id long, text string",
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    mlt_bm25_topk(docs, n_queries=3, n_terms=2, pool=5).count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    # localCheckpoint registers blocks but they are ContextCleaner-managed
    # (freed on GC), not CacheManager-pinned; persist() entries would require
    # an explicit unpersist. Assert no *cached query plan* remains:
    assert spark.catalog.clearCache() is None  # no-op sanity
    assert after - before <= 1  # the GC-managed checkpoint RDD at most
