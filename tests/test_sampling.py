"""Properties of the curation sampling operators: split stability and
stratified-sample proportions/determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm.text import stable_split, stratified_sample
from aci_export_spark.sources import read_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_split_is_stable_and_reasonably_sized(spark):
    docs = read_table(spark, SF_CORRECT, "documents")
    a = {r["doc_id"]: r["split"] for r in stable_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in stable_split(docs).collect()}
    assert a == b  # no RNG anywhere
    n_val = sum(1 for s in a.values() if s == "val")
    # 10% target with binomial slack
    assert 0.05 * len(a) <= n_val <= 0.15 * len(a)
    # a corpus subset gets identical assignments (documents never migrate)
    sub = {r["doc_id"]: r["split"]
           for r in stable_split(docs.filter(F.col("doc_id") % 7 == 0)).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_stratified_sample_hits_fractions(spark):
    docs = read_table(spark, SF_CORRECT, "documents")
    fractions = {"en": 0.2, "de": 0.8, "fr": 0.5}
    present = {r["lang"] for r in docs.select("lang").distinct().collect()}
    fractions = {k: v for k, v in fractions.items() if k in present} or {
        sorted(present)[0]: 0.5
    }
    sampled = stratified_sample(docs, "lang", fractions)
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        share = got.get(lang, 0) / totals[lang]
        assert abs(share - frac) < 0.15, (lang, share, frac)
    # strata not in the fractions dict are dropped entirely
    assert set(got) <= set(fractions)
    # seeded: rerun identical
    again = {r["lang"]: r["n"] for r in
             stratified_sample(docs, "lang", fractions).groupBy("lang")
             .agg(F.count("*").alias("n")).collect()}
    assert got == again
