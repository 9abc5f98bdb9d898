"""Round-6 ADVICE regression tests: the funnel's shuffle-partition restore,
the variance denominator overflow class, byte-suffix coverage in
_parse_bytes, and exact out-of-order cross-batch funnel merging."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from aci_export_spark.llm import dedup as D


def test_parse_bytes_tera_peta_and_fractional():
    assert D._parse_bytes("1t") == 1 << 40
    assert D._parse_bytes("2TB") == 2 << 40
    assert D._parse_bytes("1p") == 1 << 50
    assert D._parse_bytes("1pb") == 1 << 50
    assert D._parse_bytes("0.5g") == 1 << 29
    assert D._parse_bytes("1.5m") == (3 << 20) // 2


def test_parse_bytes_unknown_suffix_falls_back_conservative():
    # must NOT raise: a raise was swallowed by the caller's blanket except,
    # silently disabling the wide-scan guard (round-6 ADVICE)
    assert D._parse_bytes("12 parsecs") == 128 << 20
    assert D._parse_bytes("") == 128 << 20
    assert D._parse_bytes("m128") == 128 << 20


def test_funnel_foreach_batch_unsets_unset_shuffle_conf(spark, tmp_path):
    """If the session never set spark.sql.shuffle.partitions explicitly, the
    funnel must UNSET it afterwards, not leave the session pinned at 4."""
    from aci_export_spark.streaming.core import funnel_foreach_batch

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05", "signup"), (1, "2024-01-01 00:00:08", "view")],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    d = str(tmp_path / "feed")
    ev.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(d)

    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    try:
        spark.conf.unset("spark.sql.shuffle.partitions")
        out = funnel_foreach_batch(stream, spark)
        assert out.count() == 1
        # session default restored: conf no longer reports the funnel's 4
        assert spark.conf.get("spark.sql.shuffle.partitions", None) != "4"
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _chunks_to_stream(spark, tmp_path, chunks, name):
    root = str(tmp_path / name)
    os.makedirs(root)
    schema = "user_id long, ts timestamp, event_type string"
    for i, rows in enumerate(chunks):
        spark.createDataFrame(
            [(u, t, e) for (u, t, e) in rows],
            "user_id long, ts_s string, event_type string",
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
        ).coalesce(1).write.parquet(f"{root}/c{i}")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/c*")
    )


def _final_rows(df):
    return sorted(
        (
            r["user_id"],
            *[
                None if r[f"t_{s}"] is None else str(r[f"t_{s}"])
                for s in ("signup", "view", "click", "purchase")
            ],
            r["stage_reached"],
        )
        for r in df.collect()
    )


def test_funnel_foreach_batch_out_of_order_promotion(spark, tmp_path):
    """The exact round-6 ADVICE scenario: view@8 arrives while t_signup=10
    (not slot-filling), then signup@5 arrives in a LATER batch — the view@8
    must be promoted (t_view=8), not silently forgotten."""
    from aci_export_spark.operators.funnel import funnel_steps
    from aci_export_spark.streaming.core import funnel_foreach_batch

    t = lambda s: f"2024-01-01 00:00:{s:02d}"  # noqa: E731
    chunks = [
        # user 1: the ADVICE case. user 2: slot-decrease re-promotion
        # (signup@10,view@20 established, then signup@5+view@8 arrive late).
        [(1, t(10), "signup"), (1, t(8), "view"), (2, t(10), "signup"), (2, t(20), "view")],
        [(1, t(5), "signup"), (2, t(5), "signup"), (2, t(8), "view")],
        # user 3: pre-signup activity only, signup never arrives (no row)
        [(3, t(1), "view"), (3, t(2), "click")],
    ]
    stream = _chunks_to_stream(spark, tmp_path, chunks, "ooo")
    got = funnel_foreach_batch(stream, spark)

    all_ev = spark.createDataFrame(
        [(u, ts, e) for c in chunks for (u, ts, e) in c],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    want = funnel_steps(all_ev, ("signup", "view", "click", "purchase"))
    assert _final_rows(got) == _final_rows(want)
    row = {r["user_id"]: r for r in got.collect()}
    assert str(row[1]["t_signup"]).endswith("00:00:05")
    assert str(row[1]["t_view"]).endswith("00:00:08")
    assert str(row[2]["t_view"]).endswith("00:00:08")
    assert 3 not in row


def test_funnel_foreach_batch_random_batching_fuzz(spark, tmp_path):
    """Arbitrary (seeded) shuffling of the smoke events table into 3
    micro-batches must reproduce the batch funnel exactly — the general
    out-of-order guarantee, not just the constructed case."""
    import random

    from aci_export_spark.operators.funnel import funnel_steps
    from aci_export_spark.sources import read_table
    from aci_export_spark.streaming.core import FUNNEL_STEPS, funnel_foreach_batch
    from tests.conftest import SF_SMOKE

    ev = read_table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_type")
    rows = [(r["user_id"], str(r["ts"]), r["event_type"]) for r in ev.collect()]
    rng = random.Random(7)
    rng.shuffle(rows)
    per = math.ceil(len(rows) / 3)
    chunks = [rows[i * per : (i + 1) * per] for i in range(3)]
    stream = _chunks_to_stream(spark, tmp_path, [c for c in chunks if c], "fuzz")
    got = funnel_foreach_batch(stream, spark)
    want = funnel_steps(ev, FUNNEL_STEPS)
    assert _final_rows(got) == _final_rows(want)


def test_variance_denominator_survives_large_n(spark):
    """n·(n−1) must go through decimal(38,0): a BIGINT product overflows
    (ANSI error) once a single event_type passes ~3e9 rows. Simulated by
    driving the same expression shape with a huge literal n."""
    dd = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    df = spark.createDataFrame([(4_000_000_000, 10, 30)], "n long, syc long, syyc long")
    num = (dd("n") * dd("syyc") - dd("syc") * dd("syc")).cast("double")
    den = (dd("n") * (dd("n") - 1)).cast("double")
    out = df.select((num / den).alias("v")).collect()[0]["v"]
    assert out == pytest.approx(
        (4e9 * 30 - 100) / (4e9 * (4e9 - 1)), rel=1e-12
    )
