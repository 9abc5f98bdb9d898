"""Chi-square feature selection (llm/text.py) and the HyperLogLog sketch
(operators/sketches.py): hand-computed contingencies, the positive-
association contract, register exactness vs a pure-python replay, the
merge law, and the estimator's error envelope."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aci_export_spark.llm.text import chisq_feature_terms
from aci_export_spark.operators.sketches import (
    HLL_P,
    HLL_WBITS,
    hll_estimate,
    hll_registers,
)


# ---------------------------------------------------------------------------
# chi-square
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string, source string")


def test_chisq_hand_computed(spark):
    # 6 docs, 2 domains; "spam" in 3/3 of domain A, 0/3 of B → the
    # perfectly discriminative term: n11=3, n1_=3, n_1=3, N=6
    # diff = n11*n22 - n12*n21 = 3*3 - 0*0 = 9; num = 6*81 = 486
    # den = 3*3*3*3 = 81  (χ² = 6, the max for N=6 at these margins)
    rows = [
        (1, "spam ham x", "A"),
        (2, "spam y ham", "A"),
        (3, "spam z ham", "A"),
        (4, "ham a b", "B"),
        (5, "ham c d", "B"),
        (6, "ham e f", "B"),
    ]
    out = chisq_feature_terms(_docs(spark, rows), min_df=3, k=5).collect()
    by = {(r["domain"], r["term"]): r.asDict() for r in out}
    spam = by[("A", "spam")]
    assert spam["n11"] == 3 and spam["n1_"] == 3 and spam["n_1"] == 3
    assert spam["chi2_num"] == 486 and spam["chi2_den"] == 81
    assert spam["rank"] == 1
    # "ham" appears in every doc → diff = 0 → not positively associated
    assert ("A", "ham") not in by and ("B", "ham") not in by


def test_chisq_positive_association_only(spark):
    # "rare" in 1/3 of A and 3/3 of B: positively associated with B only
    rows = [
        (1, "rare q w e r t", "A"),
        (2, "q w e r t y", "A"),
        (3, "q w e r t y", "A"),
        (4, "rare q w e r t", "B"),
        (5, "rare q w e r t", "B"),
        (6, "rare q w e r t", "B"),
    ]
    out = chisq_feature_terms(_docs(spark, rows), min_df=2, k=10).collect()
    doms = {r["domain"] for r in out if r["term"] == "rare"}
    assert doms == {"B"}


def test_chisq_min_df_filter(spark):
    rows = [
        (1, "unique common", "A"),
        (2, "common", "A"),
        (3, "common", "B"),
        (4, "common", "B"),
    ]
    out = chisq_feature_terms(_docs(spark, rows), min_df=2, k=10).collect()
    assert all(r["term"] != "unique" for r in out)


def test_chisq_rank_contract(spark):
    """Ranks are 1..k per domain, dense from 1, ratio-ordered."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chisq_feature_terms(docs, min_df=5, k=7).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in out:
        per[r["domain"]].append(r)
    for dom, rs in per.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1)), dom
        rs = sorted(rs, key=lambda x: x["rank"])
        ratios = [x["chi2_num"] / x["chi2_den"] for x in rs]
        assert ratios == sorted(ratios, reverse=True), dom


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_python(values, salt="hll:"):
    """Pure-python register replay of hll_registers: md5-derived 60-bit
    hash, top-p register index, rho = leading zeros of the w-bit tail + 1."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:15], 16)
        reg = h >> HLL_WBITS
        w = h % (1 << HLL_WBITS)
        rho = HLL_WBITS + 1 if w == 0 else HLL_WBITS - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    vals = [f"user{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], schema="k string").withColumn(
        "g", F.lit("all")
    )
    got = {
        r["register"]: r["max_rho"]
        for r in hll_registers(df, "k", ["g"]).collect()
    }
    assert got == _hll_python(vals)


def test_hll_merge_law(spark):
    """Union-of-registers (max) over two disjoint halves equals the whole
    corpus's registers — the property that lets partitions/days sketch
    independently."""
    df = spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        (F.col("id") % 2).cast("string").alias("half"),
    )
    whole = hll_registers(df.withColumn("g", F.lit("all")), "k", ["g"])
    halves = hll_registers(df.withColumnRenamed("half", "g"), "k", ["g"])
    merged = halves.groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    w = {(r["register"], r["max_rho"]) for r in whole.collect()}
    m = {(r["register"], r["max_rho"]) for r in merged.collect()}
    assert w == m


def test_hll_estimate_error_envelope(spark):
    """Raw-regime estimate (n > 5/2·m) lands within 5σ of truth
    (σ ≈ 1.04/√m ≈ 4.6% at m=512) — deterministic, not flaky: the hash
    is fixed, so this asserts a constant."""
    n = 5000
    df = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id")).alias("k"), F.lit("g").alias("g")
    )
    est = hll_estimate(hll_registers(df, "k", ["g"]), ["g"]).collect()[0]
    assert abs(est["hll_estimate"] - n) < 0.23 * n
    assert est["n_registers"] <= 1 << HLL_P


def test_hll_estimate_all_integer_types(spark):
    df = spark.range(100).select(
        F.col("id").cast("string").alias("k"), F.lit("g").alias("g")
    )
    out = hll_estimate(hll_registers(df, "k", ["g"]), ["g"])
    assert dict(out.dtypes) == {
        "g": "string",
        "n_registers": "bigint",
        "z_scaled": "bigint",
        "hll_estimate": "bigint",
    }
