"""Delta-probe mode of the prefix-filtered Jaccard pair join: probing with a
subset id set must return exactly the full-join pairs that involve at least
one probe doc — no extras, no misses, same jaccard values."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm import dedup as D
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.9


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in df.collect()
    }


def test_probe_equals_filtered_full_join(spark):
    docs = read_table(spark, SF_SMOKE, "documents").withColumn(
        "toks", D.word_tokens(F.col("text"))
    )
    probe_ids = docs.select("doc_id").filter(F.col("doc_id") % 7 == 0)
    probe_set = {r["doc_id"] for r in probe_ids.collect()}

    full = _pairs(
        D.jaccard_pairs_prefix(docs, "doc_id", "toks", "lang", THRESHOLD)
    )
    delta = _pairs(
        D.jaccard_pairs_prefix(
            docs, "doc_id", "toks", "lang", THRESHOLD, probe=probe_ids
        )
    )

    expected = {
        pair: jac
        for pair, jac in full.items()
        if pair[0] in probe_set or pair[1] in probe_set
    }
    assert delta == expected
    assert len(delta) > 0  # the fixture has near-dups touching the probe set
    # every emitted pair is normalized and involves a probe doc
    assert all(a < b for a, b in delta)
    assert all(a in probe_set or b in probe_set for a, b in delta)
