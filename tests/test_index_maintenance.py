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


def test_ivfpq_index_upsert_matches_rebuild_at_code_granularity(spark):
    from aci_export_spark.harness_llm import llm_ivfpq_index_upsert

    rows = llm_ivfpq_index_upsert(spark, SF_SMOKE).collect()
    assert rows, "index must have populated cells"
    assert all(r["matches_rebuild"] for r in rows)
    assert all(0 <= r["cell"] < 8 for r in rows)
    emb = read_table(spark, SF_SMOKE, "embeddings")
    want_n = emb.filter(F.col("vec_id") % 10 != 7).count()
    assert sum(r["n_vectors"] for r in rows) == want_n
    # the digest carries code weight beyond the id census (a membership-
    # only digest would equal sum_ids * 31 in every cell)
    assert any(r["code_digest"] != r["sum_ids"] * 31 for r in rows)


def test_ivfpq_frozen_codebooks_delta_encode_equals_full_encode(spark):
    """The FAISS freeze contract the query relies on: encoding the delta
    separately with the frozen models yields exactly the codes a full
    corpus encode assigns those vectors."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = S.kmeans_fit_sample(emb, k_cells=8, seed=42, sample_rows=2048)
    books = S.pq_fit_sample(emb, m=8, ksub=16, seed=42, sample_rows=2048)
    full = {
        r["vec_id"]: (r["cell"], list(r["pq_code"]))
        for r in S.pq_encode(S.ivf_assign_centroids(emb, cents), books)
        .select("vec_id", "cell", "pq_code")
        .collect()
    }
    delta = emb.filter(F.col("vec_id") % 10 == 3)
    part = {
        r["vec_id"]: (r["cell"], list(r["pq_code"]))
        for r in S.pq_encode(S.ivf_assign_centroids(delta, cents), books)
        .select("vec_id", "cell", "pq_code")
        .collect()
    }
    assert part and all(full[v] == cc for v, cc in part.items())


def test_pq_reference_cell_codes_agrees_with_spark_encode(spark):
    """The new layout reference (backing the upsert golden oracle) must
    bit-match the Spark assignment + encode on the smoke corpus."""
    from aci_export_spark.llm.similarity import pq_reference_cell_codes

    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = S.kmeans_fit_sample(emb, k_cells=8, seed=42, sample_rows=2048)
    books = S.pq_fit_sample(emb, m=8, ksub=16, seed=42, sample_rows=2048)
    got = {
        r["vec_id"]: (r["cell"], list(r["pq_code"]))
        for r in S.pq_encode(S.ivf_assign_centroids(emb, cents), books)
        .select("vec_id", "cell", "pq_code")
        .collect()
    }
    want = pq_reference_cell_codes(f"{SF_SMOKE}/embeddings.parquet")
    assert got == {v: (c, list(cs)) for v, (c, cs) in want.items()}
