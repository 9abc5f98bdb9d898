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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aci_export_spark.llm.text import word_tokens

K1 = 1.2
B = 0.75
_K1P1 = K1 + 1.0  # 2.2 — same double as the SQL literal
_ONE_MINUS_B = 1.0 - B  # 0.25, exact


def _materialize_tf(tf: DataFrame, artifact_key: tuple | None) -> DataFrame:
    """Materialize the (doc, token, tf) aggregate that four downstream
    subtrees (dl, df, stats, hits) all consume.

    ``persist()`` is deliberately avoided: CacheManager entries are pinned
    until an explicit unpersist, so a library function that persists and
    returns a lazy result leaks one cached corpus-sized table per call in
    any long-lived process (bench sweeps across sf_dirs accumulate them —
    the round-5 ADVICE finding). With an `artifact_key` the table goes
    through the shared_df artifact cache (deduplicated per application +
    corpus snapshot, the warehouse-table discipline); without one it is
    ``localCheckpoint``-ed, whose blocks the ContextCleaner frees when the
    RDD handle is garbage-collected. Under SPARK_GRAFT_PLAN_CAPTURE the
    lazy plan is returned so captured plans show the real computation.
    """
    if os.environ.get("SPARK_GRAFT_PLAN_CAPTURE"):
        return tf
    if artifact_key is not None:
        from aci_export_spark.artifacts import shared_df

        return shared_df(tf.sparkSession, artifact_key, lambda: tf)
    return tf.localCheckpoint(eager=True)


def bm25_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_terms: int = 3,
    top_k: int = 20,
    artifact_key: tuple | None = None,
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
    tf = _materialize_tf(tf, artifact_key)

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


def mlt_bm25_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_queries: int = 10,
    n_terms: int = 3,
    pool: int = 20,
    artifact_key: tuple | None = None,
) -> DataFrame:
    """More-like-this BM25: each of the first `n_queries` documents queries
    the corpus with its OWN `n_terms` most frequent tokens (tf desc, token
    asc — deterministic, data-derived), scoring every other document with
    the same rational-idf / fixed-slot-summation BM25 as :func:`bm25_topk`.
    Returns (query_id, doc_id, rank) with per-query rank ≤ `pool`.

    Plan shape: ONE corpus scan builds tf; dl/df/stats derive from it; the
    query-term table is n_queries·n_terms rows and broadcasts into the tf
    join, so the scoring join is corpus-linear regardless of query count.
    The self-match is excluded (a document trivially tops its own query).
    """
    tf = (
        docs.select(
            F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = _materialize_tf(tf, artifact_key)
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").cast("long").alias("total_tokens"))
    )

    wq = Window.partitionBy(id_col).orderBy(F.col("tf").desc(), F.col("token").asc())
    qterms = (
        tf.filter(F.col(id_col) < n_queries)
        .withColumn("term_rank", F.row_number().over(wq))
        .filter(F.col("term_rank") <= n_terms)
        .select(F.col(id_col).alias("query_id"), "token", "term_rank")
    )
    # attach df to the tiny term table (broadcast side), not to every hit
    qterms = dfreq.join(F.broadcast(qterms), on="token").select(
        "query_id", "token", "term_rank", "df"
    )

    hits = (
        tf.join(F.broadcast(qterms), on="token")
        .filter(F.col(id_col) != F.col("query_id"))
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
    slotted = hits.withColumn("contrib", idf * ((tf_d * F.lit(_K1P1)) / denom))

    slot_cols = [
        F.coalesce(
            F.max(F.when(F.col("term_rank") == r, F.col("contrib"))),
            F.lit(0.0),
        ).alias(f"__s{r}")
        for r in range(1, n_terms + 1)
    ]
    per_doc = slotted.groupBy("query_id", id_col).agg(*slot_cols)
    score = F.col("__s1")
    for r in range(2, n_terms + 1):
        score = score + F.col(f"__s{r}")
    w = Window.partitionBy("query_id").orderBy(F.col("__score").desc(), F.col(id_col).asc())
    return (
        per_doc.withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= pool)
        .select("query_id", F.col(id_col).alias("doc_id"), "rank")
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two per-query
    rankings, each shaped (query_id, doc_id, rank):

        rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))

    with absent-from-list contributing 0. With exactly TWO lists the score
    is a two-term IEEE sum — addition is commutative (only associativity
    isn't), so the score is bit-identical in any engine regardless of
    evaluation order, which is what makes the fused ranking (ties broken on
    doc_id) exactly oracle-checkable. Emits (query_id, doc_id, fused_rank,
    in_sparse, in_dense), fused_rank ≤ k per query.

    Scale shape: both inputs are already per-query top-`pool` (bounded), so
    the full-outer join and the fusion window move k·queries rows — the
    fusion stage is never the bottleneck; the rankers are.
    """
    s = sparse.select("query_id", "doc_id", F.col("rank").alias("__sr"))
    d = dense.select("query_id", "doc_id", F.col("rank").alias("__dr"))
    fused = s.join(d, on=["query_id", "doc_id"], how="full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("__sr")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("__dr")), F.lit(0.0))
        ).alias("__rrf"),
        F.col("__sr").isNotNull().alias("in_sparse"),
        F.col("__dr").isNotNull().alias("in_dense"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select("query_id", "doc_id", "fused_rank", "in_sparse", "in_dense")
    )


def ranker_agreement(sparse: DataFrame, dense: DataFrame) -> DataFrame:
    """Exact rank-agreement diagnostics between two pool-bounded rankings
    (the retrieval-eval primitive behind "do my sparse and dense rankers
    see the same corpus?"): per query, the SHARED-item overlap and the
    Kendall concordant/discordant pair counts over it — all exact BIGINTs
    (tau-a = (concordant − discordant) / n_pairs is one caller-side
    division; ranks within a ranking are distinct, so there are no ties).

    Inputs are (query_id, doc_id, rank) tables. Scale shape: both inputs
    are top-k pools (≤ k rows per query by construction), so the
    within-query pair self-join is bounded at k·(k−1)/2 rows per query —
    pool-bounded like rrf_fuse, never corpus-bounded. Queries whose
    rankings share < 2 items report zero pairs (total assignment over the
    sparse ranking's query set)."""
    s = sparse.select("query_id", "doc_id", F.col("rank").alias("__rs"))
    d = dense.select("query_id", "doc_id", F.col("rank").alias("__rd"))
    shared = s.join(d, on=["query_id", "doc_id"])
    a = shared.select(
        "query_id",
        F.col("doc_id").alias("__ida"),
        F.col("__rs").alias("__rsa"),
        F.col("__rd").alias("__rda"),
    )
    b = shared.select(
        "query_id",
        F.col("doc_id").alias("__idb"),
        F.col("__rs").alias("__rsb"),
        F.col("__rd").alias("__rdb"),
    )
    pairs = a.join(b, on="query_id").filter(F.col("__ida") < F.col("__idb"))
    conc = (
        (F.col("__rsa") < F.col("__rsb")) == (F.col("__rda") < F.col("__rdb"))
    ).cast("long")
    agg = pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(conc).alias("concordant"),
    )
    n_shared = shared.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        s.select("query_id")
        .distinct()
        .join(n_shared, on="query_id", how="left")
        .join(agg, on="query_id", how="left")
        .select(
            "query_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("concordant", F.lit(0)).alias("concordant"),
            (
                F.coalesce("n_pairs", F.lit(0))
                - F.coalesce("concordant", F.lit(0))
            ).alias("discordant"),
        )
    )
