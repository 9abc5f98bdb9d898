"""SemDeDup semantic dedup: differential test against the single-process
numpy reference (both keep rules), plus structural invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aci_export_spark.llm.semdedup import (
    reference_semantic_dedup_numpy,
    semantic_dedup,
)
from aci_export_spark.llm.similarity import kmeans_fit_sample
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE

PARAMS = dict(k_cells=8, seed=42, sample_rows=2048, threshold=0.35)


def _spark_rows(spark, keep_rule):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_fit_sample(
        emb, k_cells=PARAMS["k_cells"], seed=PARAMS["seed"],
        sample_rows=PARAMS["sample_rows"],
    )
    out = semantic_dedup(
        emb, cents, threshold=PARAMS["threshold"], keep_rule=keep_rule
    )
    return sorted(
        (int(r.vec_id), int(r.cell), int(r.component), int(r.cluster_size),
         bool(r.keep))
        for r in out.collect()
    )


@pytest.mark.parametrize("keep_rule", ["min_id", "centroid_sim"])
def test_semantic_dedup_matches_numpy_reference(spark, keep_rule):
    """Full pipeline (sample fit -> assignment -> pairs -> components ->
    keep rule) against an independent pyarrow+numpy implementation."""
    expected = reference_semantic_dedup_numpy(
        f"{SF_SMOKE}/embeddings.parquet",
        k_cells=PARAMS["k_cells"], seed=PARAMS["seed"],
        sample_rows=PARAMS["sample_rows"], threshold=PARAMS["threshold"],
        keep_rule=keep_rule,
    )
    assert _spark_rows(spark, keep_rule) == expected


def test_exactly_one_survivor_per_component(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = kmeans_fit_sample(emb, k_cells=8, seed=42, sample_rows=2048)
    out = semantic_dedup(emb, cents, threshold=PARAMS["threshold"]).persist()
    try:
        assert out.count() == emb.count()  # total assignment
        per_comp = out.groupBy("component").agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.count(F.lit(1)).alias("n"),
            F.max("cluster_size").alias("sz"),
            F.min("cluster_size").alias("sz2"),
        )
        bad = per_comp.filter(
            (F.col("n_keep") != 1) | (F.col("n") != F.col("sz"))
            | (F.col("sz") != F.col("sz2"))
        )
        assert bad.count() == 0
    finally:
        out.unpersist()


def test_keep_rules_partition_identically(spark):
    """The keep rule changes WHICH member survives, never the component
    structure."""
    a = _spark_rows(spark, "min_id")
    b = _spark_rows(spark, "centroid_sim")
    assert [(r[0], r[1], r[2], r[3]) for r in a] == [
        (r[0], r[1], r[2], r[3]) for r in b
    ]
    assert sum(r[4] for r in a) == sum(r[4] for r in b)


def test_bad_keep_rule_rejected(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="keep_rule"):
        semantic_dedup(emb, [[0.0]], keep_rule="random")
