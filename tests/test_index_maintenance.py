"""Incremental vector-index maintenance and dedup-method agreement:
semantic invariants beyond the registry oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.harness_llm import (
    llm_dedup_method_agreement,
    llm_vector_index_upsert,
)
from aci_export_spark.llm import similarity as S
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_vector_index_upsert_matches_rebuild_everywhere(spark):
    rows = llm_vector_index_upsert(spark, SF_SMOKE).collect()
    assert rows, "index must have populated cells"
    assert all(r["matches_rebuild"] for r in rows)
    assert all(0 <= r["cell"] < 8 for r in rows)
    # census: the final corpus is every vector whose id % 10 != 7
    emb = read_table(spark, SF_SMOKE, "embeddings")
    want_n = emb.filter(F.col("vec_id") % 10 != 7).count()
    want_s = (
        emb.filter(F.col("vec_id") % 10 != 7)
        .agg(F.sum("vec_id").cast("long"))
        .collect()[0][0]
    )
    assert sum(r["n_vectors"] for r in rows) == want_n
    assert sum(r["sum_ids"] for r in rows) == want_s


def test_vector_index_upsert_stats_partition_by_assignment(spark):
    """Per-cell stats must equal a direct groupBy over the final corpus's
    assignment — the incremental path is an optimization, not a new
    definition."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = S.kmeans_fit_sample(emb, k_cells=8, seed=42, sample_rows=2048)
    direct = {
        r["cell"]: (r["n"], r["s"])
        for r in S.ivf_assign_centroids(
            emb.filter(F.col("vec_id") % 10 != 7), cents
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vec_id").cast("long").alias("s"),
        )
        .collect()
    }
    got = {
        r["cell"]: (r["n_vectors"], r["sum_ids"])
        for r in llm_vector_index_upsert(spark, SF_SMOKE).collect()
    }
    assert got == direct


def test_method_agreement_intersections_bounded_and_symmetric_free(spark):
    rows = llm_dedup_method_agreement(spark, SF_SMOKE).collect()
    assert len(rows) == 3
    pairs = {(r["method_a"], r["method_b"]) for r in rows}
    assert pairs == {
        ("minhash", "ngram"),
        ("minhash", "simhash"),
        ("ngram", "simhash"),
    }
    for r in rows:
        assert r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["n_a"] >= 0 and r["n_b"] >= 0
