"""pmi_collocations (llm/text.py): a genuine collocation must outrank a
frequent-but-independent bigram; exact sufficient statistics."""

from __future__ import annotations

from aci_export_spark.llm import text as T


def test_collocation_outranks_independent_pair(spark):
    # "new york" always together (strong collocation); "the cat" both very
    # frequent but combined only sometimes (weak PMI).
    docs = []
    for i in range(10):
        docs.append((i, "new york " + "the " * 6 + "cat " * 2 + "the cat"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = T.pmi_collocations(df, "doc_id", "text", min_count=5, k=10).collect()
    by_gram = {r["gram"]: r for r in rows}
    assert "new york" in by_gram and "the cat" in by_gram
    assert by_gram["new york"]["rank"] < by_gram["the cat"]["rank"]
    ny = by_gram["new york"]
    # exact stats: 10 docs x 1 occurrence; c_x = c_y = 10
    assert ny["c_xy"] == 10 and ny["c_x"] == 10 and ny["c_y"] == 10
    # ratio num/den must decode back to the rational definition
    assert ny["pmi_num"] % ny["c_xy"] == 0


def test_min_count_filters(spark):
    df = spark.createDataFrame(
        [(0, "rare pair " + "filler word " * 10)], ["doc_id", "text"]
    )
    rows = T.pmi_collocations(df, "doc_id", "text", min_count=5, k=10).collect()
    assert all(r["c_xy"] >= 5 for r in rows)
    assert "rare pair" not in {r["gram"] for r in rows}
