"""BM25 retrieval scoring — the ranking half of a retrieval-augmented
data pipeline (dedup-aware corpus search, contamination triage, nearest-
document audit queries).

Okapi BM25 with the standard (k1, b) form:

    score(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Determinism across engines: every input to the formula (tf, df, dl,
n_docs, Σdl) is exact BIGINT; idf uses the *rational* Robertson form
(n − df + 0.5)/(df + 0.5) with no logarithm — log is monotone in the
rational, so ranking is unchanged, and the expression stays inside
correctly-rounded IEEE +,−,×,÷ that Spark and any oracle engine evaluate
bit-identically.  Per-document summation over query terms is the one
float-order hazard; it is pivoted to fixed slots (one conditional MAX per
term rank, then a left-to-right chain of +) so the addition order is part
of the query, not of the shuffle.

Plan shape at 100 TB: one corpus scan builds the (doc, token) tf
aggregate; document length, document frequency, corpus stats, and the
query-term list all derive from THAT aggregate (no second scan); query
terms and the 1-row stats broadcast; per-doc top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aci_export_spark.llm.text import word_tokens

K1 = 1.2
B = 0.75
_K1P1 = K1 + 1.0  # 2.2 — same double as the SQL literal
_ONE_MINUS_B = 1.0 - B  # 0.25, exact


def bm25_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_terms: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top-`top_k` documents by BM25 against the corpus's own `n_terms`
    most frequent tokens (a deterministic, data-derived query — no
    hard-coded vocabulary).  Returns (doc_id, dl, n_terms_hit, score,
    rank); only documents matching ≥1 query term compete."""
    tf = (
        docs.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.persist()

    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("occ")
    )
    stats = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").cast("long").alias("total_tokens"))
    )

    terms = (
        dfreq.orderBy(F.col("occ").desc(), F.col("token").asc())
        .limit(n_terms)
        .select(
            "token",
            "df",
            F.row_number()
            .over(Window.orderBy(F.col("occ").desc(), F.col("token").asc()))
            .alias("term_rank"),
        )
    )

    hits = (
        tf.join(F.broadcast(terms), on="token")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
    )
    n_docs_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = (n_docs_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
    denom = tf_d + F.lit(K1) * (F.lit(_ONE_MINUS_B) + F.lit(B) * (dl_d / avgdl))
    contrib = idf * ((tf_d * F.lit(_K1P1)) / denom)
    slotted = hits.withColumn("contrib", contrib)

    slot_cols = [
        F.coalesce(
            F.max(F.when(F.col("term_rank") == r, F.col("contrib"))),
            F.lit(0.0),
        ).alias(f"__s{r}")
        for r in range(1, n_terms + 1)
    ]
    per_doc = slotted.groupBy(id_col, "dl").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"), *slot_cols
    )
    score = F.col("__s1")
    for r in range(2, n_terms + 1):
        score = score + F.col(f"__s{r}")
    scored = per_doc.withColumn("score", score).select(
        id_col, "dl", "n_terms_hit", "score"
    )
    ranked = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(top_k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w))
