"""Fixture/property tests for the batch-3 analytics operators: skyline
vs brute-force dominance, IVM under retractions, item-item cosine by
hand, BM25 ranking sanity, trailing-window boundaries, and the Morton
interleave property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aci_export_spark.operators.ivm import merge_partials, partial_aggregate
from aci_export_spark.operators.recsys import item_item_cosine
from aci_export_spark.operators.skyline import pareto_frontier


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def _brute_frontier(rows):
    out = []
    for r in rows:
        # strict-part dominance: an exact duplicate never dominates its twin
        dominated = any(
            o[1] >= r[1] and o[2] >= r[2] and (o[1] > r[1] or o[2] > r[2])
            for o in rows
        )
        if not dominated:
            out.append(r[0])
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    rows = [
        # (id, x, y) — includes x-ties, y-ties, exact duplicates, and a
        # point dominated only via equal-x
        (1, 10.0, 5),
        (2, 10.0, 7),   # beats 1 at same x
        (3, 8.0, 9),
        (4, 8.0, 9),    # exact duplicate of 3 — both survive
        (5, 12.0, 3),
        (6, 12.0, 3),   # duplicate of 5
        (7, 7.0, 9),    # dominated by 3 (same y, smaller x)
        (8, 1.0, 1),    # dominated by everyone
        (9, 13.0, 1),   # max x, survives
    ]
    df = spark.createDataFrame(rows, "id int, x double, y int")
    got = sorted(
        r.id for r in pareto_frontier(df, "x", "y").select("id").collect()
    )
    assert got == _brute_frontier(rows)


def test_skyline_partitioned(spark):
    rows = [(1, "a", 1.0, 1), (2, "a", 2.0, 2), (3, "b", 1.0, 1)]
    df = spark.createDataFrame(rows, "id int, p string, x double, y int")
    got = sorted(
        r.id
        for r in pareto_frontier(df, "x", "y", partition_by=["p"])
        .select("id")
        .collect()
    )
    # partition b's only row survives even though partition a dominates it
    assert got == [2, 3]


# ---------------------------------------------------------------------------
# IVM
# ---------------------------------------------------------------------------


def test_ivm_retractions_match_recompute(spark):
    base_facts = spark.createDataFrame(
        [("k1", 10, 1), ("k1", 20, 1), ("k2", 5, 1)], "k string, v long, w int"
    )
    # delta retracts one k1 fact, inserts a k3 fact, and fully retracts k2
    delta_facts = spark.createDataFrame(
        [("k1", 10, -1), ("k3", 7, 1), ("k2", 5, -1)], "k string, v long, w int"
    )
    spec = dict(keys=["k"], count_col="n", sum_cols={"s": "v"}, weight_col="w")
    merged = merge_partials(
        partial_aggregate(base_facts, **spec),
        partial_aggregate(delta_facts, **spec),
        keys=["k"],
        count_col="n",
        sum_cols=["s"],
        delta_has_retractions=True,
    )
    got = {r.k: (r.n, r.s) for r in merged.collect()}
    # recompute over surviving facts: k1 keeps (20,), k3 has (7,), k2 vanishes
    assert got == {"k1": (1, 20), "k3": (1, 7)}


def test_ivm_max_under_deletes_refused(spark):
    df = spark.createDataFrame([("k", 1, 1)], "k string, v long, w int")
    agg = partial_aggregate(
        df, keys=["k"], count_col="n", sum_cols={}, max_cols={"m": "v"}
    )
    with pytest.raises(ValueError):
        merge_partials(
            agg, agg, keys=["k"], count_col="n", sum_cols=[],
            max_cols=["m"], delta_has_retractions=True,
        )


# ---------------------------------------------------------------------------
# Item-item cosine
# ---------------------------------------------------------------------------


def test_item_cosine_by_hand(spark):
    # u1: A×2, B×1; u2: A×1, B×1 → dot(A,B)=2·1+1·1=3,
    # ‖A‖²=4+1=5, ‖B‖²=1+1=2
    rows = [("u1", "A"), ("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B")]
    df = spark.createDataFrame(rows, "u string, i string")
    got = item_item_cosine(df, "u", "i", top_k=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.item_a, r.item_b, r.dot, r.norm_sq_a, r.norm_sq_b) == ("A", "B", 3, 5, 2)
    assert r.cosine == pytest.approx(3 / (5**0.5 * 2**0.5))


def test_item_cosine_hub_user_capped(spark):
    hub = [("hub", f"i{k}") for k in range(10)]
    pair = [("u", "i0"), ("u", "i1")]
    df = spark.createDataFrame(hub + pair, "u string, i string")
    got = item_item_cosine(df, "u", "i", top_k=100, max_items_per_user=5).collect()
    # hub user exceeds the cap, so only u's single pair remains
    assert [(r.item_a, r.item_b) for r in got] == [("i0", "i1")]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_ranks_term_density(spark):
    from aci_export_spark.llm.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),
            (2, "apple banana cherry dates"),
            (3, "cherry dates elderberry fig"),
            (4, "apple banana apple banana"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(docs, "doc_id", "text", n_terms=2, top_k=10).collect()
    by_id = {r.doc_id: r for r in got}
    # doc 3 matches neither of the top-2 terms (apple, banana) → absent
    assert 3 not in by_id
    # doc 4 hits both terms twice; doc 2 hits both once; same length → 4 first
    assert got[0].doc_id == 4
    assert by_id[4].score > by_id[2].score
    assert by_id[4].n_terms_hit == 2
    # ranks are 1..n in score order
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


# ---------------------------------------------------------------------------
# Trailing-window trending
# ---------------------------------------------------------------------------


def test_trending_window_boundary(spark):
    from aci_export_spark import harness_analytics as ha

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, '{"k": 1}'),
            (2, "2024-01-07 00:00:00", 1, '{"k": 2}'),  # day 1 is 6 days back: inside
            (3, "2024-01-08 00:00:00", 1, '{"k": 2}'),  # day 1 is 7 days back: outside
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        F.col("event_type").alias("props"),
    )
    # reuse the query body on a temp dir is heavier than inlining the same
    # plan; replicate the operator pipeline directly
    daily = (
        ev.select(F.to_date("ts").alias("day"),
                  F.get_json_object("props", "$.k").cast("int").alias("item"))
        .groupBy("day", "item").agg(F.count(F.lit(1)).alias("cnt"))
    )
    covered = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day"),
        "item", "cnt",
    )
    windowed = covered.groupBy("day", "item").agg(F.sum("cnt").alias("w7"))
    active = daily.select("day").distinct()
    got = {
        (str(r.day), r.item): r.w7
        for r in windowed.join(active, "day", "left_semi").collect()
    }
    assert got[("2024-01-07", 1)] == 1  # item 1 still visible 6 days later
    assert ("2024-01-08", 1) not in got  # fell out on day 7


# ---------------------------------------------------------------------------
# Morton interleave property
# ---------------------------------------------------------------------------


def test_zorder_bit_interleave(spark):
    from aci_export_spark.harness_llm import _zorder_sql

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 1023) for y in (0, 1, 7, 1023)],
        "ux long, minute_of_day long",
    )
    rows = df.select(
        "ux", "minute_of_day",
        F.expr(_zorder_sql("ux", "minute_of_day")).cast("long").alias("z"),
    ).collect()
    for r in rows:
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(10))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(10))
        assert (x, y) == (r.ux, r.minute_of_day)


# ---------------------------------------------------------------------------
# Band join
# ---------------------------------------------------------------------------


def test_band_join_matches_bruteforce(spark):
    from aci_export_spark.operators.band_join import band_join

    vals = [0.0, 0.049, 0.05, 0.051, 0.1, 0.15, 1.0, 1.049, -0.02, -0.07]
    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "lid int, lv double"
    )
    right = spark.createDataFrame(
        [(i + 100, v) for i, v in enumerate(vals)], "rid int, rv double"
    )
    eps = 0.05
    got = sorted(
        (r.lid, r.rid)
        for r in band_join(left, right, "lv", "rv", eps=eps).collect()
    )
    expect = sorted(
        (i, j + 100)
        for i, a in enumerate(vals)
        for j, b in enumerate(vals)
        if abs(a - b) <= eps
    )
    assert got == expect


# ---------------------------------------------------------------------------
# Attribution
# ---------------------------------------------------------------------------


def test_linear_attribution_by_hand(spark):
    from aci_export_spark.operators.attribution import linear_attribution

    rows = [
        # u1: view(d1), click(d2), purchase(d3) → both touches credited
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 00:00:00", 1, "click"),
        (3, "2024-01-03 00:00:00", 1, "purchase"),
        # u1 second purchase 10 days later → only touches within 7d (none)
        (4, "2024-01-13 00:00:00", 1, "purchase"),
        # u2: touch AFTER the purchase → no credit
        (5, "2024-01-05 00:00:00", 2, "purchase"),
        (6, "2024-01-06 00:00:00", 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.conversion_id, r.channel): (r.touches_n, r.total_n, r.share)
        for r in linear_attribution(
            ev, "user_id", "ts", "event_type", "event_id",
            "purchase", ("view", "click"), window_days=7,
        ).collect()
    }
    assert got == {
        (3, "view"): (1, 2, 0.5),
        (3, "click"): (1, 2, 0.5),
    }


# ---------------------------------------------------------------------------
# Exact OLS slope
# ---------------------------------------------------------------------------


def test_ols_slope_by_hand(spark, duck):
    # y = 2x + 1 exactly, one group → slope 2, intercept 1
    from aci_export_spark import harness  # registry import side effect

    rows = [(i, 2 * i + 1) for i in range(5)]
    pts = spark.createDataFrame(rows, "x long, yc long")
    sums = pts.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("syc"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("yc")).cast("long").alias("sxyc"),
    )
    num = (F.col("n") * F.col("sxyc") - F.col("sx") * F.col("syc")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    r = sums.select((num / den).alias("slope")).collect()[0]
    assert r.slope == 2.0


def test_chi2_cells_reconstruct_statistic(spark, duck):
    """Folding the contribution cells gives the classic chi² statistic."""
    from aci_export_spark.harness import REGISTRY

    from tests.conftest import SF_CORRECT

    df = REGISTRY["events_chi2_cells"].fn(spark, SF_CORRECT).toPandas()
    # observed totals are consistent: sum of expected == sum of observed
    assert df["observed"].sum() == int(round(df["expected"].sum()))
    assert (df["contribution"] >= 0).all()


def test_inverted_index_postings_numeric_order(spark):
    from aci_export_spark.harness import REGISTRY
    from tests.conftest import SF_CORRECT

    df = REGISTRY["docs_inverted_index"].fn(spark, SF_CORRECT).toPandas()
    assert len(df) == 20
    for p in df["postings"]:
        ids = [int(x) for x in p.split(",")]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)


# ---------------------------------------------------------------------------
# Snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_by_hand(spark):
    from aci_export_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "k int, s string, v int",
    )
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {
        2: ("changed", "s"),
        3: ("changed", "v"),   # NULL → 30 is a change (null-safe compare)
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_bloom_prefilter_reduces_fact_side(spark):
    from aci_export_spark.llm.bloom import bloom_build, bloom_probe

    keys = spark.range(0, 50).select(F.col("id").alias("key"))
    facts = spark.range(0, 5000).select(F.col("id").alias("key"))
    bloom = bloom_build(keys, "key")
    kept = (
        bloom_probe(facts, bloom, "key").filter(F.col("maybe_member")).count()
    )
    # all 50 true members kept (no false negatives), most of the 5000 dropped
    assert 50 <= kept < 500


# ---------------------------------------------------------------------------
# Tolerant CSV source + clustered writer
# ---------------------------------------------------------------------------


def test_csv_tolerant_quarantines_bad_rows(spark, tmp_path):
    from aci_export_spark.sources import read_csv_tolerant

    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,10\n2,notanint\n3,30\n")
    df = read_csv_tolerant(spark, str(p), "id int, v int").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted((r.id, r.v) for r in good.collect()) == [(1, 10), (3, 30)]
    assert bad.count() == 1 and bad.collect()[0]._corrupt_record == "2,notanint"
    df.unpersist()


def test_write_clustered_layout(spark, tmp_path):
    from aci_export_spark.sources import write_clustered

    df = spark.createDataFrame(
        [(d % 3, i, 1000 - i) for d, i in
         ((x // 100, x) for x in range(300))],
        "day int, a long, b long",
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, "day", ("a",))
    back = spark.read.parquet(out)
    assert back.count() == 300
    # hive partitioning materialized
    import os
    assert any(n.startswith("day=") for n in os.listdir(out))
    # rows inside each file are sorted by the cluster column → per-file
    # min/max ranges are tight; check via per-input-file monotonicity
    rows = back.select(
        "a", F.monotonically_increasing_id().alias("rid"),
        F.input_file_name().alias("f"),
    ).collect()
    by_file = {}
    for r in sorted(rows, key=lambda r: r.rid):
        by_file.setdefault(r.f, []).append(r.a)
    for seq in by_file.values():
        assert seq == sorted(seq)


def test_histogram_and_drift_survive_degenerate_inputs(spark, tmp_path):
    # constant value (mx = mn) AND all events on one day (second half
    # empty): both engines must produce the same DEFINED result — bucket 0
    # for every row, NULL shares for the empty half — instead of diverging
    # on x/0 semantics (Spark non-ANSI NULL vs DuckDB IEEE Inf/NaN)
    import duckdb

    from aci_export_spark.harness import REGISTRY, _ensure_all_registered

    _ensure_all_registered()

    ev_dir = tmp_path / "degenerate"
    ev_dir.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-03-01 12:00:00' AS ts,
                   CAST(i % 7 AS BIGINT) AS user_id,
                   'click' AS event_type,
                   CAST(5.5 AS DOUBLE) AS value,
                   '{{}}' AS props
            FROM range(50) t(i)
        ) TO '{ev_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{ev_dir}/events.parquet'"
    )
    for name in ("events_value_histogram", "dq_value_drift_cells"):
        spec = REGISTRY[name]
        got = spec.fn(spark, str(ev_dir)).toPandas()
        oracle = spec.oracle() if callable(spec.oracle) else spec.oracle
        want = con.sql(oracle).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        g = sorted(tuple(str(v) for v in r) for r in got.itertuples(index=False))
        w = sorted(tuple(str(v) for v in r) for r in want.itertuples(index=False))
        assert g == w, f"{name} diverged on degenerate input:\n{g}\n{w}"
        assert len(g) > 0


def test_write_clustered_multi_file_ranges_disjoint(spark, tmp_path):
    # target_files_per_partition > 1 must split along the CLUSTER-KEY RANGE:
    # every written file's [min, max] of the cluster column is disjoint from
    # every other file's in the same hive partition — that is what lets
    # parquet footer stats prune files for range predicates. (A hash salt
    # would make every file span ~the full domain.)
    from aci_export_spark.sources import write_clustered

    df = spark.createDataFrame(
        [(x // 200, x, 1000 - x) for x in range(600)],
        "day int, a long, b long",
    )
    out = str(tmp_path / "clustered_multi")
    write_clustered(df, out, "day", ("a",), target_files_per_partition=4)
    back = spark.read.parquet(out)
    assert back.count() == 600
    spans = (
        back.groupBy("day", F.input_file_name().alias("f"))
        .agg(F.min("a").alias("lo"), F.max("a").alias("hi"))
        .collect()
    )
    by_day = {}
    for r in spans:
        by_day.setdefault(r.day, []).append((r.lo, r.hi))
    for day, ranges in by_day.items():
        ranges.sort()
        assert len(ranges) > 1, f"day {day} wrote a single file at target 4"
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, f"day {day}: file ranges overlap: {ranges}"
