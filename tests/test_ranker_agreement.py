"""Property tests for llm/retrieval.ranker_agreement (the driver oracle
covers the end-to-end BM25-vs-dense composition; these pin the fold's
algebra on constructed rankings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.llm.retrieval import ranker_agreement


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_self_agreement_is_fully_concordant(spark):
    r = _ranking(spark, [(1, d, i + 1) for i, d in enumerate((10, 20, 30, 40))])
    out = ranker_agreement(r, r).collect()[0]
    assert (out["n_shared"], out["n_pairs"]) == (4, 6)
    assert out["concordant"] == 6 and out["discordant"] == 0


def test_reversed_ranking_is_fully_discordant(spark):
    docs = (10, 20, 30, 40, 50)
    a = _ranking(spark, [(1, d, i + 1) for i, d in enumerate(docs)])
    b = _ranking(spark, [(1, d, len(docs) - i) for i, d in enumerate(docs)])
    out = ranker_agreement(a, b).collect()[0]
    assert out["n_pairs"] == 10
    assert out["concordant"] == 0 and out["discordant"] == 10


def test_disjoint_and_singleton_overlap_report_zero_pairs(spark):
    a = _ranking(spark, [(1, 10, 1), (1, 20, 2), (2, 10, 1), (2, 30, 2)])
    b = _ranking(spark, [(1, 77, 1), (1, 88, 2), (2, 10, 1), (2, 99, 2)])
    rows = {r["query_id"]: r for r in ranker_agreement(a, b).collect()}
    assert set(rows) == {1, 2}  # total assignment over sparse's queries
    assert (rows[1]["n_shared"], rows[1]["n_pairs"]) == (0, 0)
    assert (rows[2]["n_shared"], rows[2]["n_pairs"]) == (1, 0)


def test_kendall_counts_match_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(5)
    docs = list(range(100, 130))
    rows_a, rows_b, expect = [], [], {}
    for q in range(4):
        pool_a = rng.sample(docs, 12)
        pool_b = rng.sample(docs, 12)
        rows_a += [(q, d, i + 1) for i, d in enumerate(pool_a)]
        rows_b += [(q, d, i + 1) for i, d in enumerate(pool_b)]
        ra = {d: i + 1 for i, d in enumerate(pool_a)}
        rb = {d: i + 1 for i, d in enumerate(pool_b)}
        shared = sorted(set(pool_a) & set(pool_b))
        conc = disc = 0
        for x, y in itertools.combinations(shared, 2):
            if (ra[x] < ra[y]) == (rb[x] < rb[y]):
                conc += 1
            else:
                disc += 1
        expect[q] = (len(shared), conc, disc)
    out = {
        r["query_id"]: r
        for r in ranker_agreement(
            _ranking(spark, rows_a), _ranking(spark, rows_b)
        ).collect()
    }
    for q, (ns, conc, disc) in expect.items():
        assert out[q]["n_shared"] == ns
        assert out[q]["concordant"] == conc
        assert out[q]["discordant"] == disc
        assert out[q]["n_pairs"] == conc + disc == ns * (ns - 1) // 2
