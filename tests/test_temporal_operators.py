"""Semantic unit tests for the temporal join operators (operators/asof.py,
operators/range_join.py) on tiny inline frames: inclusivity, strictness,
tie-breaks, unmatched-row handling, bucket boundaries.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aci_export_spark.operators.asof import asof_join, latest_per_key_ts
from aci_export_spark.operators.range_join import bucketed_range_join, keyed_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 12:00:00")),
            (3, "k2", _ts("2024-01-01 09:00:00")),  # before any right row
        ],
        "lid long, k string, lts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01 10:00:00")),  # equal-ts to lid=1
            (11, "k1", _ts("2024-01-01 11:00:00")),
            (12, "k2", _ts("2024-01-01 09:30:00")),
        ],
        "rid long, k string, rts timestamp",
    )


def test_asof_inclusive_backward(spark):
    out = asof_join(
        _left(spark), _right(spark), key=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], how="left",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # lid=1 sees the equal-ts right row (inclusive); lid=2 the latest prior;
    # lid=3 has no prior right row at all
    assert got == {1: 10, 2: 11, 3: None}


def test_asof_strict_excludes_equal_ts(spark):
    out = asof_join(
        _left(spark), _right(spark), key=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], how="left", strict=True,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got == {1: None, 2: 11, 3: None}


def test_asof_inner_drops_unmatched(spark):
    out = asof_join(
        _left(spark), _right(spark), key=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], how="inner",
    )
    assert {r["lid"] for r in out.collect()} == {1, 2}


def test_asof_tie_break_picks_max_tie(spark):
    left = _left(spark).filter(F.col("lid") == 2)
    # two right rows share (k1, 11:00) — the greater rid must win
    right = _right(spark).union(
        _right(spark).sparkSession.createDataFrame(
            [(99, "k1", _ts("2024-01-01 11:00:00"))], "rid long, k string, rts timestamp"
        )
    )
    out = asof_join(
        left, right, key=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], right_tie="rid",
    )
    assert out.collect()[0]["rid"] == 99


def test_latest_per_key_ts_dedups(spark):
    df = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 00:00:00")), (2, "k", _ts("2024-01-01 00:00:00"))],
        "rid long, k string, rts timestamp",
    )
    out = latest_per_key_ts(df, key=["k"], ts="rts", tie="rid").collect()
    assert len(out) == 1 and out[0]["rid"] == 2


def test_keyed_range_join_inclusive_endpoints(spark):
    facts = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00")), ("k", _ts("2024-01-01 10:10:00")),
         ("k", _ts("2024-01-01 10:10:01")), ("x", _ts("2024-01-01 10:05:00"))],
        "k string, fts timestamp",
    )
    iv = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:10:00"))],
        "k string, s timestamp, e timestamp",
    )
    out = keyed_range_join(facts, iv, key=["k"], fact_ts="fts", start="s", end="e")
    # both endpoints inclusive; wrong key and out-of-window rows excluded
    assert out.count() == 2


def test_bucketed_range_join_matches_naive(spark):
    facts = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=7 * i)) for i in range(40)],
        "fid long, fts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00")),
         (200, _ts("2024-01-01 03:33:00"), _ts("2024-01-01 03:34:00"))],
        "ivid long, s timestamp, e timestamp",
    )
    bucketed = bucketed_range_join(facts, iv, "fts", "s", "e", bucket_seconds=600)
    naive = facts.join(iv, (facts.fts >= iv.s) & (facts.fts <= iv.e))
    assert sorted((r["fid"], r["ivid"]) for r in bucketed.collect()) == sorted(
        (r["fid"], r["ivid"]) for r in naive.collect()
    )
    # each (fact, interval) pair appears exactly once (single-bucket facts)
    pairs = [(r["fid"], r["ivid"]) for r in bucketed.collect()]
    assert len(pairs) == len(set(pairs))


class TestScd2History:
    def _hist(self, spark, rows):
        from aci_export_spark.operators.scd import scd2_history

        df = spark.createDataFrame(rows, ["k", "ts", "attr", "seq"])
        out = scd2_history(
            df.withColumn("ts", F.col("ts").cast("timestamp")),
            "k", "ts", ["attr"], tiebreak_col="seq",
        )
        return sorted(
            (
                (r.k, r.attr, str(r.valid_from), str(r.valid_to), r.version, r.is_current)
                for r in out.collect()
            ),
            key=lambda t: (t[0], t[4]),  # (key, version) — attr may be None
        )

    def test_collapse_close_and_current(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", "A", 1),
            (1, "2024-01-02 00:00:00", "A", 2),   # no-op: collapses
            (1, "2024-01-03 00:00:00", "B", 3),   # opens v2, closes v1
            (2, "2024-01-01 00:00:00", None, 1),  # NULL first attr still opens
            (2, "2024-01-02 00:00:00", "X", 2),
        ]
        got = self._hist(spark, rows)
        assert got == [
            (1, "A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", 1, False),
            (1, "B", "2024-01-03 00:00:00", "None", 2, True),
            (2, None, "2024-01-01 00:00:00", "2024-01-02 00:00:00", 1, False),
            (2, "X", "2024-01-02 00:00:00", "None", 2, True),
        ]

    def test_same_instant_tiebreak_and_idempotent_replay(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", "A", 1),
            (1, "2024-01-01 00:00:00", "B", 2),  # same instant: A becomes a
            # zero-length interval, B wins the instant under the seq order
        ]
        got = self._hist(spark, rows)
        assert got == [
            (1, "A", "2024-01-01 00:00:00", "2024-01-01 00:00:00", 1, False),
            (1, "B", "2024-01-01 00:00:00", "None", 2, True),
        ]
        # replaying the same feed twice changes nothing (no-op collapse)
        assert self._hist(spark, rows + rows) == got


def test_funnel_steps_chain_and_ties(spark):
    from aci_export_spark.operators.funnel import funnel_steps, funnel_summary

    rows = [
        # u1 completes: signup@1, view@2, click@2 (tie with view: >= allows), buy@5
        (1, 1, "signup"), (1, 2, "view"), (1, 2, "click"), (1, 5, "purchase"),
        # u2 breaks: purchase BEFORE click → stage 2
        (2, 1, "signup"), (2, 3, "view"), (2, 2, "purchase"),
        # u3 never signs up → absent entirely
        (3, 1, "view"), (3, 2, "click"), (3, 3, "purchase"),
        # u4 view precedes signup → view must re-occur after; it doesn't
        (4, 5, "signup"), (4, 1, "view"),
    ]
    ev = spark.createDataFrame(
        [(u, float(t), ty) for u, t, ty in rows],
        "user_id long, ts double, event_type string",
    ).selectExpr("user_id", "CAST(timestamp_seconds(ts) AS TIMESTAMP_NTZ) AS ts", "event_type")
    steps = ("signup", "view", "click", "purchase")
    out = {r["user_id"]: r.asDict() for r in funnel_steps(ev, steps).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["stage_reached"] == 4
    assert out[2]["stage_reached"] == 2
    assert out[4]["stage_reached"] == 1 and out[4]["t_view"] is None
    summary = {
        r["step"]: r["users"]
        for r in funnel_summary(funnel_steps(ev, steps), steps).collect()
    }
    assert summary == {"signup": 3, "view": 2, "click": 1, "purchase": 1}


def test_retention_cohorts_offsets_and_sizes(spark):
    rows = [
        (1, "2024-01-01"), (1, "2024-01-01"), (1, "2024-01-03"),
        (2, "2024-01-01"), (2, "2024-01-02"),
        (3, "2024-01-02"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP_NTZ) AS ts"
    )
    from aci_export_spark.operators.funnel import retention_cohorts

    got = {
        (r["cohort_day"], r["day_offset"]): (r["active_users"], r["cohort_size"])
        for r in retention_cohorts(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2)  # u1+u2 on day 0 (dup event collapsed)
    assert got[("2024-01-01", 1)] == (1, 2)  # u2 returns day 1
    assert got[("2024-01-01", 2)] == (1, 2)  # u1 returns day 2
    assert got[("2024-01-02", 0)] == (1, 1)  # u3's own cohort
    assert len(got) == 4


def test_basket_cooccurrence_cap_and_lift(spark):
    from aci_export_spark.operators.basket import cooccurrence_pairs

    rows = (
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
        # basket 9 is over the cap → contributes nothing
        + [(9, f"x{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): r.asDict()
        for r in cooccurrence_pairs(df, "basket", "item", top_k=10,
                                    max_basket_items=3).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab["pair_support"] == 2 and ab["support_a"] == 3 and ab["support_b"] == 2
    assert ab["n_baskets"] == 3
    assert ab["lift"] == (2 * 3) / (3 * 2)  # exact-count division


def test_frequent_triples_apriori(spark):
    from aci_export_spark.operators.basket import frequent_triples

    # {a,b,c} together in 3 baskets; {a,b,d} only once; d never frequent
    rows = []
    for bkt in (1, 2, 3):
        rows += [(bkt, "a"), (bkt, "b"), (bkt, "c")]
    rows += [(4, "a"), (4, "b"), (4, "d")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = frequent_triples(
        df, "basket", "item", min_support=3, top_k=10, max_basket_items=10
    ).collect()
    assert [(r["item_a"], r["item_b"], r["item_c"], r["triple_support"]) for r in out] == [
        ("a", "b", "c", 3)
    ]
