"""Streaming gram-index maintenance (streaming/core.gram_index_stream):
multi-batch ingest must merge to exactly the batch rebuild, and the
single-batch degenerate guard must raise (the events-glob lesson: a
stream that silently collapses to one batch verifies nothing)."""

from __future__ import annotations

import pytest

from aci_export_spark import streaming as ST
from aci_export_spark.llm.dedup import duplicated_gram_table
from aci_export_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def test_stream_merges_to_batch_rebuild(spark):
    counter: dict = {}
    out = ST.gram_index_stream(
        spark, SF, n=8, min_docs=2, n_files=4, batch_counter=counter
    )
    assert counter["batches"] >= 2, "ingest must span multiple micro-batches"
    got = sorted(map(tuple, out.collect()))
    want = sorted(
        map(
            tuple,
            duplicated_gram_table(
                read_table(spark, SF, "documents"), "doc_id", "text", n=8,
                min_docs=2,
            ).collect(),
        )
    )
    assert got == want and len(want) > 0


def test_single_batch_guard_raises(spark, tmp_path):
    # see test_streaming_chunk_index: the adaptive trigger means only a
    # one-non-empty-file landing (a 1-doc corpus) runs in a single batch
    read_table(spark, SF, "documents").limit(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    with pytest.raises(RuntimeError, match="micro-batch"):
        ST.gram_index_stream(spark, str(tmp_path), n=8, min_docs=2, n_files=1)
