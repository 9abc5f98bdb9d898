"""Streaming chunk-index maintenance (streaming/core.chunk_index_stream):
multi-batch ingest must merge to exactly the batch rebuild, and the
single-batch degenerate guard must raise."""

from __future__ import annotations

import pytest

from aci_export_spark import streaming as ST
from aci_export_spark.llm.text import chunk_dedup_stats
from aci_export_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def test_stream_merges_to_batch_rebuild(spark):
    counter: dict = {}
    out = ST.chunk_index_stream(
        spark, SF, chunk_tokens=64, stride=48, min_docs=2, n_files=4,
        batch_counter=counter,
    )
    assert counter["batches"] >= 2, "ingest must span multiple micro-batches"
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(
            tuple,
            chunk_dedup_stats(
                read_table(spark, SF, "documents"), "doc_id", "text", 64, 48
            ).collect(),
        )
    )
    assert got == want and len(want) > 0


def test_single_batch_guard_raises(spark, tmp_path):
    # Since the trigger adapted to the landed file count (min(cap,
    # files//2)), a small n_files alone can no longer force one batch —
    # the genuine single-batch condition is a corpus whose landing holds
    # only ONE non-empty file, i.e. a 1-doc corpus
    read_table(spark, SF, "documents").limit(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    with pytest.raises(RuntimeError, match="micro-batch"):
        ST.chunk_index_stream(spark, str(tmp_path), n_files=1)


def test_winnow_stream_merges_to_batch_rebuild(spark):
    import pyspark.sql.functions as F

    from aci_export_spark.llm.winnow import winnow_fingerprints

    counter: dict = {}
    out = ST.winnow_index_stream(
        spark, SF, k=24, w=8, min_docs=2, n_files=4, batch_counter=counter
    )
    assert counter["batches"] >= 2
    got = sorted(map(tuple, out.collect()))
    fps = winnow_fingerprints(
        read_table(spark, SF, "documents"), "doc_id", "text", k=24, w=8
    )
    want = sorted(
        map(
            tuple,
            fps.groupBy("fp_hash")
            .agg(
                F.count_distinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_selections"),
            )
            .filter(F.col("n_docs") >= 2)
            .collect(),
        )
    )
    assert got == want and len(want) > 0
