"""Exact Fisher test + Benjamini-Hochberg FDR over term-domain tables.

The statistically careful sibling of ``chisq_feature_terms``: for sparse
cells the chi-square approximation is invalid; Fisher's exact test
(Fisher 1934) computes the true conditional p-value from the
hypergeometric distribution, and Benjamini-Hochberg (1995) controls the
false-discovery rate across the whole term vocabulary — the standard
"which terms REALLY distinguish this domain" pipeline for corpus
diagnostics and leakage hunts.

Exactness discipline: all hypergeometric mass terms are exact Python big
integers over the shared denominator C(N, n); the two-sided rule is the
exact one (sum every table whose mass is <= the observed mass — no
1+1e-7 float tolerance, which is what float implementations need and is
deliberately NOT replicated); the emitted p-value is the floored ppb
grid p_ppb = floor(p_num * 1e9 / C(N, n)), and BH runs entirely on that
grid with integer cross-multiplied comparisons (p_ppb * m <= rank *
q_ppb), so both the p-values and the rejection set are engine-exact.

100 TB shape: one corpus scan explodes distinct (doc, term) presence
rows; cells and margins are map-side-combined groupBys on the term key
(term x domain cardinality, never doc cardinality); the big-int Fisher
stage is an Arrow ``mapInPandas`` over those vocabulary-bounded rows
(each row's support loop is <= min(margins) exact-integer recurrence
steps); BH is a per-domain window over the same bounded rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

from aci_export_spark.llm.text import word_tokens

#: Loud cap on the corpus size the EXACT test will run at. The big-int
#: hypergeometric masses carry ~N/7 digits and the support loop is
#: min(margins) steps, so cost grows super-linearly in N — measured 1.1 s
#: at N=5,000 but 72.9 s at N=50,000 (the CD-10x stress row). Exact
#: Fisher is a bounded-table statistic; past this cap the query FAILS
#: NAMED (the chisq/PMI discipline) — use llm_chisq_terms (asymptotically
#: equivalent at these counts) or a log-gamma approximation, the
#: documented 100 TB dial.
FISHER_MAX_N = 20_000


def _fisher_p_ppb(n11: int, n1_: int, n_1: int, n_tot: int) -> int:
    """Two-sided Fisher exact p on the ppb grid, exact big-int arithmetic.

    Hypergeometric mass over the shared denominator C(N, n):
    num(j) = C(K, j) * C(N-K, n-j) with K = n1_ (term margin),
    n = n_1 (domain margin). Walked by the integer recurrence
    num(j+1) = num(j) * (K-j)(n-j) // ((j+1)(N-K-n+j+1)) — each division
    is exact because the target is an integer. p = sum of num(j) over
    every j whose mass is <= the observed mass, floored onto ppb."""
    import math

    big_k, n, big_n = n1_, n_1, n_tot
    j_lo = max(0, n - (big_n - big_k))
    j_hi = min(big_k, n)
    num = math.comb(big_k, j_lo) * math.comb(big_n - big_k, n - j_lo)
    masses: dict[int, int] = {j_lo: num}
    for j in range(j_lo, j_hi):
        num = (
            num * (big_k - j) * (n - j)
            // ((j + 1) * (big_n - big_k - n + j + 1))
        )
        masses[j + 1] = num
    obs = masses[n11]
    p_num = sum(m for m in masses.values() if m <= obs)
    denom = math.comb(big_n, n)
    return (p_num * 1_000_000_000) // denom


def fisher_reference_p_ppb(n11: int, n1_: int, n_1: int, n_tot: int) -> int:
    """Independent definitional reference: every mass via math.comb
    directly (no recurrence), same exact two-sided rule and ppb floor."""
    import math

    big_k, n, big_n = n1_, n_1, n_tot
    obs = math.comb(big_k, n11) * math.comb(big_n - big_k, n - n11)
    p_num = 0
    for j in range(max(0, n - (big_n - big_k)), min(big_k, n) + 1):
        m = math.comb(big_k, j) * math.comb(big_n - big_k, n - j)
        if m <= obs:
            p_num += m
    return (p_num * 1_000_000_000) // math.comb(big_n, n)


def fisher_bh_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    min_df: int = 5,
    q_ppb: int = 50_000_000,  # q = 0.05 on the ppb grid
    max_n: int = FISHER_MAX_N,
) -> DataFrame:
    """Per (domain, term): the exact two-sided Fisher p (ppb grid) of the
    2x2 doc-presence table, the BH rank within the domain, and the BH
    rejection flag at FDR q. Output is (domain x term)-bounded.

    Raises ValueError when the corpus exceeds ``max_n`` docs — see
    :data:`FISHER_MAX_N` for why exactness is priced out past that."""
    n_docs = df.count()
    if n_docs > max_n:
        raise ValueError(
            f"fisher_bh_terms: {n_docs} docs exceeds FISHER_MAX_N={max_n}; "
            "the exact big-int hypergeometric is a bounded-table statistic "
            "(72.9 s at N=50k, CD-10x row) — use chisq_feature_terms or a "
            "log-gamma approximation at this corpus size"
        )
    pres = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(
                F.array_distinct(word_tokens(F.col(text_col)))
            ).alias("term"),
            F.col(id_col),
        )
        .groupBy("domain", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n11"))
    )
    term_tot = pres.groupBy("term").agg(
        F.sum("n11").cast("long").alias("n1_")
    )
    dom_docs = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_1")
    )
    n_total = df.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    stats = (
        pres.join(term_tot, on="term")
        .filter(F.col("n1_") >= min_df)
        .join(F.broadcast(dom_docs), on="domain")
        .join(F.broadcast(n_total))
    )

    def fisher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["p_ppb"] = [
                _fisher_p_ppb(int(a), int(k), int(n), int(t))
                for a, k, n, t in zip(
                    pdf["n11"], pdf["n1_"], pdf["n_1"], pdf["n_tot"]
                )
            ]
            yield pdf[["domain", "term", "n11", "n1_", "n_1", "p_ppb"]]

    scored = stats.mapInPandas(
        fisher,
        schema=(
            "domain string, term string, n11 long, n1_ long, n_1 long, "
            "p_ppb long"
        ),
    )
    w = Window.partitionBy("domain").orderBy("p_ppb", "term")
    ranked = scored.select(
        "*",
        # row_number() is 32-bit; rank * q_ppb wraps int32 at rank >= 43
        # (caught by the CD-10x stress sweep under ANSI mode — in a
        # non-ANSI session it would silently flip `significant` instead),
        # so the rank is widened BEFORE any arithmetic touches it
        F.row_number().over(w).cast("long").alias("bh_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("domain")).alias("m"),
    )
    # BH: reject ranks <= max{ i : p_(i) * m <= i * q } — all int64
    cond_rank = F.when(
        F.col("p_ppb") * F.col("m")
        <= F.col("bh_rank") * F.lit(q_ppb).cast("long"),
        F.col("bh_rank"),
    ).otherwise(F.lit(0).cast("long"))
    cutoff = F.max(cond_rank).over(Window.partitionBy("domain"))
    return ranked.select(
        "domain",
        "term",
        "n11",
        "n1_",
        "n_1",
        "p_ppb",
        F.col("bh_rank").cast("long").alias("bh_rank"),
        (F.col("bh_rank") <= cutoff).alias("significant"),
    )


#: Loud cap on the discordant-pair count the EXACT McNemar test will sum
#: over — past this the binomial tail has ~n/3-digit terms times n/2
#: summands and the normal approximation chi2 = (b-c)^2/(b+c) is the
#: documented dial (same reasoning as FISHER_MAX_N).
MCNEMAR_MAX_DISC = 10_000


def mcnemar_exact_p_ppb(b: int, c: int) -> int:
    """Exact two-sided McNemar p (the binomial sign test on discordant
    pairs): p = min(1, 2*P(Bin(b+c, 1/2) <= min(b, c))), floored onto the
    ppb grid. Binomials walked by the exact integer recurrence
    C(n, k+1) = C(n, k)*(n-k) // (k+1); no float anywhere."""
    n = b + c
    if n == 0:
        return 1_000_000_000
    if n > MCNEMAR_MAX_DISC:
        raise ValueError(
            f"mcnemar: {n} discordant pairs exceeds "
            f"MCNEMAR_MAX_DISC={MCNEMAR_MAX_DISC}; use the chi-square "
            "approximation (b-c)^2/(b+c) at this scale"
        )
    m = min(b, c)
    term = 1  # C(n, 0)
    tail = 1
    for k in range(m):
        term = term * (n - k) // (k + 1)
        tail += term
    p_num = 2 * tail
    denom = 1 << n
    return min(1_000_000_000, (p_num * 1_000_000_000) // denom)


def mcnemar_reference_p_ppb(b: int, c: int) -> int:
    """Independent definitional reference: every binomial via math.comb
    directly (no recurrence), same cap-at-1 rule and ppb floor."""
    import math

    n = b + c
    if n == 0:
        return 1_000_000_000
    p_num = 2 * sum(math.comb(n, k) for k in range(min(b, c) + 1))
    return min(1_000_000_000, (p_num * 1_000_000_000) // (1 << n))


def mcnemar_filters(
    df: DataFrame,
    pred_a,
    pred_b,
    q_ppb: int = 50_000_000,
) -> DataFrame:
    """McNemar's exact test (McNemar 1947) of whether two boolean
    per-row predicates (two curation filters' keep decisions on the SAME
    documents) disagree symmetrically: only the discordant cells matter
    (b = A-only, c = B-only); concordant rows carry no information about
    marginal homogeneity. One map-side-combined aggregate reduces the
    corpus to the 1-row (b, c, n) statistic; the exact binomial tail runs
    driver-side on it behind the loud :data:`MCNEMAR_MAX_DISC` cap."""
    spark = df.sparkSession
    row = df.select(
        F.sum(F.when(pred_a & ~pred_b, 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~pred_a & pred_b, 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    ).collect()[0]
    b, c, n_pairs = int(row["b"]), int(row["c"]), int(row["n_pairs"])
    p = mcnemar_exact_p_ppb(b, c)
    return local_rows_df(
        spark,
        [(n_pairs, b, c, p, p <= q_ppb)],
        schema=(
            "n_pairs long, n_a_only long, n_b_only long, p_ppb long, "
            "significant boolean"
        ),
    )
