"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
the MOSS fingerprint selection that guarantees any shared substring of
length >= w + k - 1 between two documents is detected by at least one
shared selected fingerprint, while keeping only ~2/(w+1) of all k-gram
hashes.

Algorithm, exactly as the paper defines it:
- slide a character k-gram over the normalized text and hash each gram;
- slide a window of w consecutive hashes; in each window select the
  MINIMUM hash, breaking ties by the RIGHTMOST position;
- the fingerprint set is the distinct (position, hash) pairs selected.

Spark realization — no UDFs, one shuffle:
- gram hashes are a single projection (sequence → substring → md5), so the
  corpus is scanned once;
- the per-window rightmost-argmin is ONE window-function pass: each
  (pos, h) is packed into the integer key ``h * P + (P - 1 - pos)``
  (P = 2^20 > any document's char length, guarded with an explicit
  raise on both engines), so ``MIN(key) OVER (ROWS CURRENT..w-1
  FOLLOWING)`` selects min-hash-then-max-position lexicographically and
  the winner decodes back out of the min with div/mod — no nested
  windows, no self-join of a window against its members;
- hashes are 32-bit md5 prefixes (`llm/hashing.py` discipline, shortened
  so key = h*2^20 + pos stays < 2^52): byte-identical in DuckDB, and at
  fingerprint granularity a 32-bit space only costs spurious candidate
  pairs, never missed ones.

100 TB shape: the window pass partitions by doc_id (uniform key, docs are
KB-sized so no skew); the overlap join runs on the winnowed ~2/(w+1)
subset of gram hashes, with MOSS's stop-gram cap (drop hashes seen in
more than `max_df` docs) bounding the per-key fanout exactly like the
AllPairs prefix filter bounds `llm_dedup_ngram_jaccard`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aci_export_spark.functions.text import normalize_text
from aci_export_spark.llm.dedup import spread_for_explode

#: position-packing radix: fp keys are h * POS_SPACE + (POS_SPACE-1-pos),
#: so documents must be shorter than POS_SPACE normalized chars (guarded).
POS_SPACE = 1 << 20

_SALT = "win:"


def _hash32(gram: Column) -> Column:
    """32-bit md5-prefix hash — DuckDB-portable:
    ``('0x' || substr(md5('win:' || gram), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(_SALT), gram)), 1, 8), 16, 10).cast(
        "long"
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Selected winnowing fingerprints: one row per distinct selected
    (document, position, hash); documents shorter than the w + k - 1
    guarantee threshold emit nothing (the paper's contract: substrings
    shorter than t = w + k - 1 are not guaranteed detectable).

    Returns columns (id_col, fp_pos, fp_hash); fp_pos is the 0-based char
    offset of the selected k-gram in the normalized text.
    """
    # Guard the packing radix on BOTH engines (oracle uses error()): a doc
    # longer than POS_SPACE chars would silently corrupt the packed keys.
    # Built from the SAME normalize_text Column winnow_stats uses for
    # n_grams/n_windows — a parallel SQL rendering could drift silently
    # and corrupt fingerprint positions relative to the stats (r9 ADVICE).
    # The raise is on the EXCEEDS branch, not the else: NULL text has NULL
    # length, matches neither branch (NULL condition = not taken), and
    # flows through as NULL — emitting no grams, like every other text
    # operator (a NULL-row corpus must not abort the job with a bogus
    # too-long error).
    norm_c = normalize_text(F.col(text_col))
    norm = F.when(
        F.length(norm_c) >= POS_SPACE,
        F.raise_error(F.lit("winnow: document exceeds POS_SPACE chars")).cast(
            "string"
        ),
    ).otherwise(norm_c)
    base = spread_for_explode(df.select(F.col(id_col), norm.alias("__s")))
    s = F.col("__s")
    # gram start offsets 0..len-k (empty for short docs)
    pos_seq = F.when(
        F.length(s) >= k, F.sequence(F.lit(0), F.length(s) - k)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        id_col, "__s", F.explode(pos_seq).alias("pos")
    ).select(
        id_col,
        "pos",
        _hash32(F.expr(f"substring(__s, pos + 1, {k})")).alias("h"),
        (F.length("__s") - k).alias("max_pos"),
    )
    key = (F.col("h") * POS_SPACE + (POS_SPACE - 1 - F.col("pos"))).alias("key")
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    keyed = grams.select(id_col, "pos", "max_pos", key).withColumn(
        "mk", F.min("key").over(win)
    )
    # only full windows (start pos leaves w-1 grams after it) select
    sel = keyed.filter(F.col("pos") <= F.col("max_pos") - (w - 1)).select(
        id_col,
        F.expr(f"mk div {POS_SPACE}").alias("fp_hash"),
        (F.lit(POS_SPACE - 1) - F.col("mk") % POS_SPACE).alias("fp_pos"),
    )
    return sel.distinct()


def winnow_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Per-document winnowing density: total k-grams, full windows, and
    distinct selected fingerprints (expected ~2/(w+1) of grams). Every
    document appears (zero-filled) — the join back is on the doc key the
    fingerprint pass already partitioned by. Pass a prebuilt `fps` table
    (from :func:`winnow_fingerprints`, e.g. the harness's shared artifact)
    to avoid recomputing the selection per consumer."""
    if fps is None:
        fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    per_doc = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fingerprints")
    )
    norm_len = F.length(normalize_text(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.greatest(norm_len - k + 1, F.lit(0)).cast("long").alias("n_grams"),
        F.greatest(norm_len - k - w + 2, F.lit(0)).cast("long").alias("n_windows"),
    )
    return base.join(per_doc, on=id_col, how="left").select(
        id_col,
        "n_grams",
        "n_windows",
        F.coalesce("n_fingerprints", F.lit(0)).cast("long").alias("n_fingerprints"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = 50,
    fps: DataFrame | None = None,
) -> DataFrame:
    """MOSS-style overlap candidates: document pairs sharing >= min_shared
    distinct selected fingerprint HASHES, after dropping stop-grams
    (hashes selected in more than max_df documents — boilerplate that
    would otherwise drive a quadratic per-key fanout; the paper's MOSS
    deployment does the same culling).

    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b. Pass a prebuilt
    `fps` table to reuse the selection across consumers.
    """
    if fps is None:
        fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    fps = fps.select(F.col(id_col).alias("doc"), "fp_hash").distinct()
    df_counts = fps.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("df"))
    keep = df_counts.filter((F.col("df") >= 2) & (F.col("df") <= max_df)).select(
        "fp_hash"
    )
    pruned = fps.join(keep, on="fp_hash")
    a = pruned.select(F.col("doc").alias("doc_a"), "fp_hash")
    b = pruned.select(F.col("doc").alias("doc_b"), "fp_hash")
    return (
        a.join(b, on="fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_containment(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = 50,
    fps: DataFrame | None = None,
) -> DataFrame:
    """MOSS match scores: for each overlap-candidate pair, the exact
    fingerprint-set sizes and shared count — containment(a in b) =
    n_shared / n_fp_a and resemblance = n_shared / (n_fp_a + n_fp_b −
    n_shared) are one caller-side division each (the integer sufficient
    statistics are what's emitted, the log-free discipline). This is the
    score MOSS ranks its report by: high containment with asymmetric
    sizes = one document embedded in another; high resemblance = twins.

    Consumes the same selection table as :func:`winnow_overlap_pairs`
    (pass `fps` to share the artifact); the extra work is two hash joins
    of the per-doc fingerprint-count table (corpus-cardinality — NOT
    broadcast) onto the candidate-pair table, which the stop-gram cull
    already bounded."""
    if fps is None:
        fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    pairs = winnow_overlap_pairs(
        df, id_col, text_col, k=k, w=w,
        min_shared=min_shared, max_df=max_df, fps=fps,
    )
    sizes = (
        fps.select(F.col(id_col).alias("doc"), "fp_hash")
        .distinct()
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    )
    return (
        pairs.join(
            sizes.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("n_fp_a")),
            on="doc_a",
        )
        .join(
            sizes.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("n_fp_b")),
            on="doc_b",
        )
        .select("doc_a", "doc_b", "n_shared", "n_fp_a", "n_fp_b")
    )


