"""Text-analysis operators: quality metrics, language-id heuristic, token
counting, document fingerprinting.

All pure column expressions over the `documents` table shape
(doc_id, text, lang, source, n_chars). Ratios are computed as exact integer
counts divided at the output edge (both engines produce identical doubles
from the same int division).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aci_export_spark.functions.text import normalize_text

#: Small function-word stoplists per language for the n-gram/stopword
#: language-id heuristic. Deliberately tiny: the heuristic must be cheap and
#: SQL-portable (the oracle re-implements it with list_filter).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit")
FR_STOPWORDS = ("le", "la", "les", "et", "est", "un", "une", "que", "pour")

STOPWORDS = EN_STOPWORDS  # quality-scoring stoplist


def word_tokens(text: Column) -> Column:
    return F.split(normalize_text(text), r"\s+")


def n_tokens(text: Column) -> Column:
    return F.size(word_tokens(text))


def stopword_hits(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality facets: token count, char count, mean token
    length, stopword ratio, distinct-token ratio. The standard cheap filters
    for corpus curation (length cutoffs, boilerplate detection)."""
    toks = word_tokens(F.col(text_col))
    nt = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        F.length(normalize_text(F.col(text_col))).alias("n_chars_norm"),
        (total_len.cast("double") / nt.cast("double")).alias("mean_token_len"),
        (
            stopword_hits(toks, STOPWORDS).cast("double") / nt.cast("double")
        ).alias("stopword_ratio"),
        (
            F.size(F.array_distinct(toks)).cast("double") / nt.cast("double")
        ).alias("distinct_ratio"),
    )


def langid_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-voting language id: hit counts per language stoplist, argmax
    with deterministic precedence (en > de > fr > unknown on ties).

    A real pipeline would use char-trigram profiles; the operator shape
    (per-language score columns → argmax decode) is identical.
    """
    toks = word_tokens(F.col(text_col))
    en = stopword_hits(toks, EN_STOPWORDS)
    de = stopword_hits(toks, DE_STOPWORDS)
    fr = stopword_hits(toks, FR_STOPWORDS)
    best = F.greatest(en, de, fr)
    predicted = (
        F.when(best == 0, "unknown")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return df.select(
        F.col(id_col),
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        predicted.alias("predicted_lang"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace words and BPE-ish subword chunks
    (runs of ≤4 letters — a deterministic, regex-only stand-in for a real
    tokenizer's piece count; scales as a pure JVM regex)."""
    ws = F.size(word_tokens(F.col(text_col)))
    bpe_ish = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]{1,4}"), 0)
    )
    return df.select(
        F.col(id_col),
        ws.alias("whitespace_tokens"),
        bpe_ish.alias("bpe_ish_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: content hash (md5 of normalized text) and bag
    fingerprint (md5 of the sorted distinct token set — order-insensitive,
    catches shuffled near-identical docs)."""
    norm = normalize_text(F.col(text_col))
    bag = F.array_join(F.array_sort(F.array_distinct(word_tokens(F.col(text_col)))), " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_fingerprint"),
        F.md5(bag).alias("bag_fingerprint"),
    )


CDC_WINDOW = 16          # rolling-hash window (bytes)
CDC_MASK = (1 << 6) - 1  # boundary when hash & mask == mask → ~64-byte chunks
CDC_MIN, CDC_MAX = 32, 512

_CDC_SCHEMA = (
    "doc_id long, chunk_no long, chunk_offset long, chunk_len long, "
    "chunk_fingerprint string"
)


def _cdc_chunks(data: bytes):
    """Content-defined chunk boundaries via a polynomial rolling hash
    (Rabin-Karp style). A boundary fires where the window hash matches the
    mask, clamped to [CDC_MIN, CDC_MAX] — so an insertion shifts at most the
    chunk it lands in, unlike fixed-size blocks where every later block
    changes (the property that makes chunk-level dedup robust to edits)."""
    B, M = 257, (1 << 61) - 1
    # after `h = h*B + byte`, the byte leaving the window carries B^W
    Bw = pow(B, CDC_WINDOW, M)
    chunks, start, h = [], 0, 0
    for i, byte in enumerate(data):
        h = (h * B + byte) % M
        if i - start + 1 > CDC_WINDOW:
            h = (h - data[i - CDC_WINDOW] * Bw) % M
        size = i - start + 1
        if size >= CDC_MAX or (size >= CDC_MIN and (h & CDC_MASK) == CDC_MASK):
            chunks.append((start, size))
            start, h = i + 1, 0
    if start < len(data) or not chunks:
        chunks.append((start, len(data) - start))
    return chunks


def cdc_fingerprints(df, id_col: str = "doc_id", text_col: str = "text"):
    """Content-defined-chunking fingerprints: one row per chunk with offset,
    length, and md5 — the edit-robust dedup granularity (two documents
    differing by one insertion share every chunk fingerprint outside the
    edited chunk).

    Rolling hashes are inherently sequential per document, so this is a
    ``mapInPandas`` stage: embarrassingly parallel over documents, no
    shuffle, linear output. Downstream, a groupBy(chunk_fingerprint) finds
    shared content across the corpus.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            ids, nos, offs, lens, fps = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                for no, (off, ln) in enumerate(_cdc_chunks(data)):
                    ids.append(doc_id)
                    nos.append(no)
                    offs.append(off)
                    lens.append(ln)
                    fps.append(hashlib.md5(data[off : off + ln]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids, "chunk_no": nos, "chunk_offset": offs,
                    "chunk_len": lens, "chunk_fingerprint": fps,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=_CDC_SCHEMA)


def stable_split(
    df,
    id_col: str = "doc_id",
    val_percent: int = 10,
    salt: str = "split:v1",
):
    """Deterministic train/validation assignment: bucket = md5(salt:id) mod
    100. Stable across runs, machines, and engine versions — the property a
    training pipeline needs so no document ever migrates between splits when
    the corpus is re-processed. Pure column expressions (md5 + conv), no RNG.
    """
    from pyspark.sql import functions as F

    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < val_percent, "val").otherwise("train"),
    )


def stratified_sample(
    df,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
):
    """Per-stratum Bernoulli sampling (`sampleBy`): the corpus-curation
    rebalance step (e.g. downsample over-represented languages). Seeded —
    deterministic for a fixed input partitioning; proportions are verified
    property-style in tests since the RNG stream is engine-specific.
    """
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)


def stratified_sample_stable(
    df,
    stratum_col: str,
    fractions,
    id_col: str = "doc_id",
    salt: str = "strat:v1",
):
    """Deterministic per-stratum sampling: keep a row iff
    md5(salt:id) mod 10000 < fraction·10000.

    Unlike `sampleBy`'s RNG stream, the keep-decision is a pure function of
    the row id — identical across runs, partitionings, and engines (so a
    re-processed corpus keeps exactly the same sample, and a DuckDB oracle
    can recompute it). `fractions` is a dict {stratum: fraction} or a
    DataFrame (stratum_col, fraction); the fraction table is dimension-sized
    and broadcast — no collect, no corpus shuffle, single scan.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    if isinstance(fractions, dict):
        fr = df.sparkSession.createDataFrame(
            list(fractions.items()), schema=f"{stratum_col} string, fraction double"
        )
    else:
        fr = fractions
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        df.join(broadcast(fr), on=stratum_col)
        .filter(bucket < (F.col("fraction") * 10000).cast("long"))
        .drop("fraction")
    )
