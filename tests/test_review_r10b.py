"""Regression tests for the round-10 second-wave review findings:

- pair_expansion_join must price the broadcast gate at file-bytes x the
  caller's fan-out bound (an exploded build side is bigger than its scan),
  and an unparseable autoBroadcastJoinThreshold must DISABLE broadcasting,
  never default it wider.
- PCA must treat a NULL vector element as an invalid row in both the
  moments and the output (SUM skips NULLs but COUNT doesn't — mixing them
  corrupts the covariance; the reference would crash).
- the unigram reference Viterbi must survive word types longer than the
  interpreter recursion limit allows for a naive top-down pass.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


def _carries_broadcast_hint(df) -> bool:
    """Whether pair_expansion_join FORCED a broadcast (ResolvedHint in the
    analyzed plan). The physical join choice is not the thing under test:
    with no hint, Catalyst/AQE may still broadcast a side whose ACTUAL
    (post-explode) bytes are small — which is exactly the desired runtime
    behavior. The bug class is the unconditional hint, which survives to
    corpus sizes where it OOMs."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=True)
    return "ResolvedHint" in buf.getvalue()


@pytest.fixture()
def small_parquet_pair(spark, tmp_path):
    p = str(tmp_path / "side.parquet")
    spark.createDataFrame(
        [(i, f"name{i}", i % 3) for i in range(50)], ["id", "name", "block"]
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    a = df.select(F.col("id").alias("id_a"), F.col("block"))
    b = df.select(F.col("id").alias("id_b"), F.col("block"))
    return a, b


def test_amplification_defeats_broadcast(spark, small_parquet_pair):
    from aci_export_spark.operators.fuzzy import pair_expansion_join

    a, b = small_parquet_pair
    plain = pair_expansion_join(a, b, "block", ["block"], ["block"])
    assert _carries_broadcast_hint(plain), "tiny file side should force broadcast"
    amplified = pair_expansion_join(
        a, b, "block", ["block"], ["block"],
        build_amplification=10**12,  # file bytes x this dwarfs any threshold
    )
    assert not _carries_broadcast_hint(amplified), (
        "an exploded build side must clear the threshold at size x "
        "amplification — file bytes alone prove nothing about it"
    )


def test_disabled_threshold_disables_forced_broadcast(spark, small_parquet_pair):
    """autoBroadcastJoinThreshold=-1 is the standard way users BAN
    broadcasts; the gate must honor it (and, same code path, any conf
    string the strict parse rejects — Spark validates on conf.set, so the
    unparseable case is defense-in-depth against defaults files)."""
    from aci_export_spark.operators.fuzzy import pair_expansion_join

    a, b = small_parquet_pair
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        joined = pair_expansion_join(a, b, "block", ["block"], ["block"])
        assert not _carries_broadcast_hint(joined), (
            "a disabled threshold must mean NO forced broadcast"
        )
    finally:
        spark.conf.set(key, prev)


def test_pca_null_element_rows_are_excluded_consistently(spark):
    from aci_export_spark.llm.pca import pca_whiten

    dim = 8
    rng = np.random.default_rng(5)
    rows = [
        (i, [float(v) for v in rng.standard_normal(dim)]) for i in range(30)
    ]
    rows.append((99, [1.0, None] + [2.0] * (dim - 2)))  # null element
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = pca_whiten(df, dim=dim, k=2)
    got_ids = sorted(r["vec_id"] for r in out.collect())
    assert 99 not in got_ids and len(got_ids) == 30
    # and the model equals the one fit WITHOUT the null row at all
    clean = pca_whiten(
        spark.createDataFrame(rows[:30], "vec_id bigint, embedding array<float>"),
        dim=dim, k=2,
    )
    a = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in out.collect()}
    c = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in clean.collect()}
    assert a == c


def test_unigram_reference_viterbi_survives_long_tokens():
    import sys

    from aci_export_spark.llm.unigram import _ref_viterbi

    word = "ab" * max(2000, sys.getrecursionlimit())
    scores = {"ab": 5, "a": 1, "b": 1}
    out = _ref_viterbi(word, scores, total=7, max_piece_len=2)
    assert "".join(out) == word
    assert set(out) == {"ab"}
