"""Generation-evaluation metrics over (candidate, reference) text pairs:
the BLEU / ROUGE sufficient statistics every model-eval harness computes,
expressed as exact integer counts so both engines agree bit-for-bit.

- :func:`ngram_overlap_eval` — per pair and per n, the CLIPPED n-gram
  overlap ``sum_g min(count_cand(g), count_ref(g))`` plus both sides'
  gram totals.  BLEU-n precision is ``clipped/cand_grams``; ROUGE-n
  recall is ``clipped/ref_grams``; the brevity penalty folds from the
  emitted token lengths — all caller-side divisions of exact integers
  (Papineni et al. ACL'02; Lin ACL'04 Text Summarization Branches Out).
- :func:`lcs_token_stats` — the ROUGE-L longest-common-subsequence
  length per pair, computed with the Allison–Dix bit-parallel DP
  (O(|a|·|b|/w) word ops; Python big ints make w unbounded) inside an
  Arrow-batched mapInPandas.  The independent test/oracle reference
  (:func:`lcs_reference_python`) is the CLASSIC quadratic DP table — a
  different algorithm, so an agreement is evidence, not replay.

Float discipline: every emitted quantity is an integer (counts and
lengths); precision/recall/F folds are one caller-side division each.

Scale shape: the overlap statistic is explode + two map-side-combined
gram counts + one equi-join on the (pair, gram) key — corpus-linear, no
all-pairs stage anywhere (the PAIRING is the caller's contract: eval sets
are candidate/reference aligned by construction).  The LCS pass is
Arrow-batched and per-pair bounded by ``max_tokens`` truncation (the MMR
pool-bound discipline): quadratic DP on unbounded docs would let one
pathological pair stall a task, so the bound is part of the operator's
contract and recorded in the output columns.

Reference parity note: the reference engine (madninja/aci-export) has no
eval-metric surface; this extends the beyond-reference LLM-pipeline
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aci_export_spark.llm.text import word_tokens


def ngram_overlap_eval(
    pairs: DataFrame,
    pair_id_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    n_max: int = 2,
) -> DataFrame:
    """Clipped n-gram overlap statistics for n = 1..n_max per pair.

    Output: one row per pair — ``cand_len``/``ref_len`` (token counts,
    the brevity-penalty inputs) and per n ``cand_grams_{n}`` /
    ``ref_grams_{n}`` / ``clipped_{n}`` (all BIGINT).  Pairs whose
    candidate has fewer than n tokens emit 0 grams for that n (standard
    BLEU smoothing decisions live with the caller).

    Plan: gram TOTALS are pure arithmetic on the token lengths
    (grams_n = max(len − n + 1, 0) — no aggregate needed), so only the
    CLIPPED overlap touches a shuffle: every n shares ONE tagged explode
    per side ("n|gram" keys), two map-side-combined groupBys on
    (pair, gram), one inner equi-join on that key (min(c,r) is 0 unless
    both sides carry the gram, so inner is exact), and one (pair, n)
    pivot fold — three pair-keyed shuffles total regardless of n_max
    (the first cut ran 2 groupBys + 3 joins PER n and measured 6× wall
    at CD-10×; this shape is corpus-linear in practice as well as on
    paper).
    """
    if not 1 <= n_max <= 9:
        raise ValueError("ngram_overlap_eval: n_max must be in 1..9 "
                         "(single-digit gram tags)")
    toks = pairs.select(
        F.col(pair_id_col).alias("pair_id"),
        word_tokens(F.col(cand_col)).alias("__c"),
        word_tokens(F.col(ref_col)).alias("__r"),
    )
    lens = toks.select(
        "pair_id",
        F.size("__c").cast("long").alias("cand_len"),
        F.size("__r").cast("long").alias("ref_len"),
    )

    def tagged_grams(t, n: int):
        # single-parameter lambda: F.transform treats a second parameter
        # as the ELEMENT INDEX column, so `lambda i, n=n` would silently
        # bind n to the index (caught by the oracle in-round)
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.concat(
                    F.lit(f"{n}|"), F.array_join(F.slice(t, i, n), " ")
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tagged_counts(col: str, out_cnt: str) -> DataFrame:
        t = F.col(col)
        per_n = [tagged_grams(t, n) for n in range(1, n_max + 1)]
        return (
            toks.select("pair_id", F.explode(F.concat(*per_n)).alias("gram"))
            .groupBy("pair_id", "gram")
            .agg(F.count(F.lit(1)).alias(out_cnt))
        )

    clipped = (
        tagged_counts("__c", "__cc")
        .join(tagged_counts("__r", "__rc"), ["pair_id", "gram"])
        .groupBy(
            "pair_id", F.substring("gram", 1, 1).cast("int").alias("__n")
        )
        .agg(F.sum(F.least("__cc", "__rc")).cast("long").alias("__clip"))
        .groupBy("pair_id")
        .pivot("__n", list(range(1, n_max + 1)))
        .agg(F.first("__clip"))
    )
    out = lens.join(clipped, "pair_id", "left")
    sel = [F.col("pair_id"), F.col("cand_len"), F.col("ref_len")]
    for n in range(1, n_max + 1):
        sel.append(
            F.greatest(F.col("cand_len") - n + 1, F.lit(0))
            .cast("long")
            .alias(f"cand_grams_{n}")
        )
        sel.append(
            F.greatest(F.col("ref_len") - n + 1, F.lit(0))
            .cast("long")
            .alias(f"ref_grams_{n}")
        )
        sel.append(
            F.coalesce(F.col(str(n)), F.lit(0)).cast("long").alias(f"clipped_{n}")
        )
    return out.select(*sel)


def _lcs_bitparallel(a: list[str], b: list[str]) -> int:
    """Allison–Dix (1986) bit-parallel LCS length.

    One Python big int carries the whole DP column: bit j of ``v`` is 1
    iff the DP antichain covers position j.  Per row of ``a`` the update
    is O(|b|/machine-word) big-int ops — for the bounded token lists this
    operator admits, dozens of times faster than the quadratic table, and
    algorithmically DISJOINT from the reference DP used to verify it."""
    if not a or not b:
        return 0
    pos: dict[str, int] = {}
    for j, t in enumerate(b):
        pos[t] = pos.get(t, 0) | (1 << j)
    full = (1 << len(b)) - 1
    v = full
    for t in a:
        m = pos.get(t, 0)
        u = v & m
        # standard update: v' = (v + u) | (v - u)  with borrow semantics
        v = ((v + u) | (v - u)) & full
    # LCS length = number of ZERO bits the sweep cleared
    return len(b) - bin(v).count("1")


def lcs_reference_python(a: list[str], b: list[str]) -> int:
    """Independent single-process reference: the classic quadratic DP
    table (row-rolling).  Used by the golden oracle and the differential
    tests — NOT by the Spark path."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        curr = [0]
        for j, y in enumerate(b, 1):
            curr.append(prev[j - 1] + 1 if x == y else max(prev[j], curr[j - 1]))
        prev = curr
    return prev[-1]


def lcs_token_stats(
    pairs: DataFrame,
    pair_id_col: str = "pair_id",
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    max_tokens: int = 512,
) -> DataFrame:
    """ROUGE-L sufficient statistics per pair: token-level LCS length plus
    both (truncated) lengths.  ``max_tokens`` bounds the per-pair DP work
    (quadratic in the bound, never in the doc) and is part of the metric's
    definition here — the truncation is applied identically in the oracle
    reference.

    Plan: one projection truncates token lists JVM-side (slice), then a
    single Arrow-batched mapInPandas runs the bit-parallel DP — no
    shuffle at all; the stage parallelism is the scan's.
    """
    toks = pairs.select(
        F.col(pair_id_col).alias("pair_id"),
        F.slice(word_tokens(F.col(cand_col)), 1, max_tokens).alias("__c"),
        F.slice(word_tokens(F.col(ref_col)), 1, max_tokens).alias("__r"),
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for pid, ca, ra in zip(pdf["pair_id"], pdf["__c"], pdf["__r"]):
                ca = list(ca) if ca is not None else []
                ra = list(ra) if ra is not None else []
                rows.append(
                    (int(pid), len(ca), len(ra), _lcs_bitparallel(ca, ra))
                )
            yield pd.DataFrame(
                rows, columns=["pair_id", "cand_len", "ref_len", "lcs_len"]
            )

    return toks.mapInPandas(
        run,
        schema="pair_id long, cand_len long, ref_len long, lcs_len long",
    )
