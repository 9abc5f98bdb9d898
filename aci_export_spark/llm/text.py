"""Text-analysis operators: quality metrics, language-id heuristic, token
counting, document fingerprinting.

All pure column expressions over the `documents` table shape
(doc_id, text, lang, source, n_chars). Ratios are computed as exact integer
counts divided at the output edge (both engines produce identical doubles
from the same int division).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

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


def word_ngram_pos_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Like :func:`word_ngram_rows` (every occurrence), but each row also
    carries the 1-based TOKEN POSITION the gram starts at — the input for
    span arithmetic (interval union, span removal), where gram identity
    alone is not enough. Same single-expression build, posexplode'd once."""
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.posexplode(grams).alias("__p0", "gram")).select(
        F.col(id_col), (F.col("__p0") + 1).alias("pos"), "gram"
    )


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


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    novel_max_count: int = 1,
) -> DataFrame:
    """Corpus bigram-LM quality scoring — the order-sensitive sibling of
    :func:`unigram_lm_scores`: the model is fit on word BIGRAM occurrence
    counts, so shuffled-word soup that fools the unigram filter (all
    frequent tokens, nonsense order) scores low here. Same exact-integer
    discipline: ``keep`` ⇔ freq_sum·vocab ≥ n_bigrams·total_occurrences,
    cross-multiplied so no float sits at the decision boundary;
    ``novel_bigrams`` counts occurrences whose corpus count ≤
    `novel_max_count` (at 1: bigrams this doc alone contributes).

    Documents with fewer than 2 tokens emit no row (they have no bigrams
    to score — callers compose with a length gate first, as the Gopher
    pipeline does). Plan shape is the unigram one: explode once, fit =
    groupBy on the gram key, score join re-uses that partitioning, global
    stats are a one-row broadcast.
    """
    grams = word_ngram_rows(df, id_col, text_col, n=2, distinct=False)
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__bf"))
    glob = freq.agg(
        F.sum("__bf").alias("__g_occ"), F.count(F.lit(1)).alias("__g_vocab")
    )
    per_doc = (
        grams.join(freq, on="gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__bf").alias("freq_sum"),
            F.sum(
                F.when(F.col("__bf") <= novel_max_count, 1).otherwise(0)
            ).alias("novel_bigrams"),
        )
    )
    return per_doc.join(F.broadcast(glob)).select(
        id_col,
        "n_bigrams",
        "freq_sum",
        "novel_bigrams",
        (
            F.col("freq_sum").cast("double") / F.col("n_bigrams").cast("double")
        ).alias("mean_bigram_freq"),
        (
            F.col("freq_sum") * F.col("__g_vocab")
            >= F.col("n_bigrams") * F.col("__g_occ")
        ).alias("keep"),
    )


def chunk_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG passage chunking: fixed-size token windows with overlap.

    Each document is split into chunks of `chunk_tokens` whitespace tokens
    starting every `stride` tokens (overlap = chunk_tokens - stride); the
    final chunk may be shorter, so every token is covered. Emits one row
    per chunk with its 0-based chunk_no, 1-based start token, exact token
    count, and an md5 content hash for chunk-level dedup / index keys.

    Scale shape: a single projection builds the chunk list (sequence →
    slice → join) and ONE explode emits it — amplification is ~n/stride
    per doc and the corpus is scanned once, no shuffle at all; downstream
    consumers shuffle only on the uniform md5 chunk key.
    """
    toks = F.col("__toks")
    # the empty/whitespace-only tokenization artifact: split('') = [''] —
    # one phantom token. Gate on the first token being non-empty or every
    # empty doc would emit a 1-token chunk hashing to md5(''), and any TWO
    # empty docs would then read as a duplicated passage downstream.
    starts = F.when(
        (F.size(toks) >= 1) & (F.element_at(toks, 1) != F.lit("")),
        F.sequence(F.lit(1), F.size(toks), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), toks.alias("__t"), F.explode(starts).alias("start_tok"))
        .select(
            F.col(id_col),
            ((F.col("start_tok") - 1) / stride).cast("long").alias("chunk_no"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(F.slice(F.col("__t"), F.col("start_tok"), chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.md5(
                F.array_join(F.slice(F.col("__t"), F.col("start_tok"), chunk_tokens), " ")
            ).alias("chunk_hash"),
        )
    )


def chunk_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Chunk-level exact dedup: which passage contents appear in more than
    one document (the RAG-index dedup pass — identical passages should be
    indexed once). Exactly :func:`chunk_stats_table` filtered to chunks
    seen in >= 2 distinct documents (one aggregation definition to keep
    in sync); groupBy key is the uniform md5 hash."""
    return chunk_stats_table(df, id_col, text_col, chunk_tokens, stride).filter(
        F.col("n_docs") >= 2
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information: bigrams whose
    joint count beats independence, ranked by the exact rational
    ``c_xy * N^2 / (M * c_x * c_y)`` (PMI's log is monotone, so the log
    fold is unnecessary for ranking — the log-free doc_keywords
    discipline). Numerator/denominator emitted as exact BIGINTs beside
    the one-IEEE-division ratio used for the ordering; ties break on the
    gram string. The products are computed in DECIMAL(38,0) and checked
    against the BIGINT range with an explicit raise — at token counts
    where ``c_xy * N²`` outgrows int64 the query FAILS LOUDLY (like the
    ANSI/DuckDB oracle) instead of wrapping to wrong ranks; rerank in log
    space there.

    Plan shape: one corpus scan exploded twice (unigrams, bigrams), both
    counts map-side combined; the score join hits the unigram table on
    its own key twice; global N and M are one-row broadcasts; top-k is a
    sort-limit (TakeOrderedAndProject) with row_number applied AFTER the
    limit over the k survivors — never a global window sort."""
    toks = df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").alias("__n"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 1),
                    lambda i: F.struct(
                        F.element_at("__t", i).alias("w1"),
                        F.element_at("__t", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    m_bi = bi.agg(F.sum("c_xy").alias("__m"))
    # exact products in DECIMAL(38,0): three int64 factors can reach ~1e56,
    # and non-ANSI Spark would silently WRAP a bare int64 product (DuckDB
    # raises) — decimal overflow instead yields NULL, which the checked
    # cast below converts into the same loud failure the oracle gives
    def _dec(c: "F.Column") -> "F.Column":
        return c.cast("decimal(38,0)")

    def _checked_long(c: "F.Column", what: str) -> "F.Column":
        return F.when(
            c.isNull() | (c > F.lit(2**63 - 1).cast("decimal(38,0)")),
            F.raise_error(
                F.lit(f"pmi_collocations: {what} overflows BIGINT — "
                      "rerank in log space at this token count")
            ).cast("decimal(38,0)"),
        ).otherwise(c).cast("long")

    num = _dec(F.col("c_xy")) * _dec(F.col("__n")) * _dec(F.col("__n"))
    den = _dec(F.col("__m")) * _dec(F.col("c_x")) * _dec(F.col("c_y"))
    scored = (
        bi.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x")), on="w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y")), on="w2")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(m_bi))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("gram"),
            "c_xy",
            "c_x",
            "c_y",
            _checked_long(num, "c_xy * N^2").alias("pmi_num"),
            _checked_long(den, "M * c_x * c_y").alias("pmi_den"),
            (num.cast("double") / den.cast("double")).alias("__ratio"),
        )
    )
    # global top-k as sort-limit (TakeOrderedAndProject: per-partition
    # partial top-k, no single-task global window sort); row_number runs
    # AFTER the limit, over <= k rows — the only single-task stage left is
    # k-bounded by construction
    top = scored.orderBy(F.col("__ratio").desc(), F.col("gram").asc()).limit(k)
    w = Window.orderBy(F.col("__ratio").desc(), F.col("gram").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("gram", "c_xy", "c_x", "c_y", "pmi_num", "pmi_den", "rank")
    )


def readability_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Readability inputs as exact integers — the counts Flesch/LIX-style
    scores fold (the fold itself is one caller-side division): words,
    syllables (vowel groups [aeiouy]+ per word, floor 1 — the standard
    dictionary-free approximation), polysyllables (>= 3 groups, the SMOG
    input), and long words (> 6 chars, the LIX input). One projection,
    no shuffle, everything in whole-stage codegen. Empty/whitespace-only
    documents report zero counts and a NULL average (the split('') =
    [''] phantom token is filtered out, not counted as a word)."""
    toks = F.filter(F.col("__toks"), lambda w: w != F.lit(""))
    syl = F.transform(
        toks,
        lambda w: F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)
        ),
    )
    return (
        df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_words"),
            F.aggregate(syl, F.lit(0), lambda a, x: a + x)
            .cast("long")
            .alias("n_syllables"),
            F.size(F.filter(syl, lambda s: s >= 3)).cast("long").alias("n_polysyllables"),
            F.size(F.filter(toks, lambda w: F.length(w) > 6))
            .cast("long")
            .alias("n_long_words"),
        )
        .withColumn(
            "avg_syllables_per_word",
            F.when(
                F.col("n_words") > 0,
                F.col("n_syllables").cast("double") / F.col("n_words").cast("double"),
            ),
        )
    )


def luhn_card_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Luhn-validated payment-card detection — the checksum pass that cuts
    the false positives a bare 13-19-digit regex drowns in (order ids,
    timestamps, hashes): every digit run of card length is extracted, the
    Luhn mod-10 checksum evaluated as a pure column expression (nested
    aggregate over the digit positions — no UDF), and only checksum-valid
    runs count as PII. Emits exact counts plus an md5 digest of the
    (sorted) valid runs so the redaction set itself is hash-checked.

    One projection per doc; work is bounded by candidates-per-doc, never
    corpus-quadratic; stays entirely in whole-stage codegen."""
    # the candidate extraction is PROJECTED ONCE and the Luhn filter reads
    # the column — the full-text regex scan must not be expressed twice;
    # the nested aggregate is clearer as a SQL string than as DSL lambdas
    valid = F.expr(
        """
        filter(__cands,
               c -> aggregate(
                        sequence(1, length(c)),
                        0,
                        (acc, i) -> acc + CASE
                            WHEN (length(c) - i) % 2 = 1
                            THEN CASE WHEN CAST(substr(c, i, 1) AS INT) * 2 > 9
                                      THEN CAST(substr(c, i, 1) AS INT) * 2 - 9
                                      ELSE CAST(substr(c, i, 1) AS INT) * 2 END
                            ELSE CAST(substr(c, i, 1) AS INT) END
                    ) % 10 = 0)
        """
    )
    return (
        df.select(
            F.col(id_col),
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"\b[0-9]{13,19}\b"), 0
            ).alias("__cands"),
        )
        .select(
            F.col(id_col),
            F.size("__cands").cast("long").alias("n_candidates"),
            F.size(valid).cast("long").alias("n_luhn_valid"),
            F.md5(F.array_join(F.array_sort(valid), ",")).alias("valid_digest"),
        )
    )


def chunk_stats_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Full per-chunk statistics (chunk_hash, n_docs, n_occurrences)
    INCLUDING singletons — the maintained INDEX for incremental chunk
    dedup (:func:`chunk_dedup_stats` is this filtered to n_docs >= 2;
    singletons must be kept: one delta occurrence turns a singleton into
    a duplicate). Bucket-store on the hash key in production so the
    incremental merge is a co-partitioned sum."""
    chunks = chunk_passages(df, id_col, text_col, chunk_tokens, stride)
    return chunks.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
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
        fr = local_rows_df(
            df.sparkSession,
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


def word_ngram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Explode each document into its word n-grams: one (id, gram) row per
    n-gram (distinct per doc by default; `distinct=False` keeps every
    occurrence for frequency analysis). The gram list is built as a single
    column expression (sequence → slice → array_join) and exploded once — no
    UDF, no second scan. Documents shorter than n words emit nothing (the
    `when` guard also keeps `sequence` from generating a descending range
    when size-n+1 < 1).

    The token array is BOUND AS A COLUMN before the `transform` lambda:
    expressions referenced inside a higher-order-function lambda are
    re-evaluated per array element, so an inline `split(...)` would re-run
    the tokenizer regex once per gram (~word-count× slowdown measured at
    bench scale); a projected column is computed once per row."""
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    if distinct:
        grams = F.array_distinct(grams)
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.explode(grams).alias("gram"))


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: (train_doc, test_doc) pairs sharing ≥
    `min_shared` distinct word n-grams — the GPT-3/PaLM-style overlap test
    for scrubbing evaluation data out of a training corpus.

    Scale shape: the TEST side is a benchmark set — thousands of docs
    against a 100 TB corpus — so its gram table is broadcast and the corpus
    side streams through one scan + explode with no corpus shuffle; the only
    shuffle is the tiny (train_id, test_id) count. If the test set ever
    outgrows broadcast range, drop the hint and this degrades gracefully to
    a hash join on the gram key.
    """
    from pyspark.sql.functions import broadcast

    tg = word_ngram_rows(test, id_col, text_col, n).select(
        F.col(id_col).alias("test_doc_id"), "gram"
    )
    rg = word_ngram_rows(train, id_col, text_col, n).select(
        F.col(id_col).alias("train_doc_id"), "gram"
    )
    return (
        rg.join(broadcast(tg), on="gram")
        .groupBy("train_doc_id", "test_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def gopher_quality_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, §A1.1), restated
    as EXACT integer comparisons so the keep decision is bit-identical across
    engines (no float ratios at the decision boundary):

    - word count within [10, 1000]
    - mean word length within [2, 10]  → 2·n_words ≤ total_chars ≤ 10·n_words
    - at least one stopword hit (function-word presence)
    - most-repeated 2-gram ≤ 20% of 2-grams → 5·dup2_max ≤ n_2grams

    Emits the raw counts alongside the per-rule flags: curation pipelines
    tune thresholds offline, so the counts are the durable artifact and the
    flags a point-in-time policy. One corpus scan for the per-doc counts plus
    one explode+agg for the 2-gram mode (partial aggregation map-side; the
    shuffle key is (doc, gram))."""
    toks = word_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("total_word_chars"),
        stopword_hits(toks, STOPWORDS).alias("stop_hits"),
    )
    g2 = (
        word_ngram_rows(df, id_col, text_col, n=2, distinct=False)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("dup2_max"), F.sum("__c").alias("n_2grams"))
    )
    out = base.join(g2, on=id_col, how="left").select(
        id_col,
        "n_words",
        "total_word_chars",
        "stop_hits",
        F.coalesce("dup2_max", F.lit(0)).alias("dup2_max"),
        F.coalesce("n_2grams", F.lit(0)).alias("n_2grams"),
    )
    keep = (
        F.col("n_words").between(10, 1000)
        & (F.col("total_word_chars") >= 2 * F.col("n_words"))
        & (F.col("total_word_chars") <= 10 * F.col("n_words"))
        & (F.col("stop_hits") >= 1)
        & (5 * F.col("dup2_max") <= F.col("n_2grams"))
    )
    return out.withColumn("keep", keep)


def segment_rows(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 8
) -> DataFrame:
    """Chop each document into consecutive `seg_words`-word segments (the
    RefinedWeb/CCNet "line" unit for word-soup corpora without real line
    structure). Single expression + one explode; the trailing partial
    segment is kept. Tokens are bound as a column before the lambda (see
    :func:`word_ngram_rows` — inline tokenization would re-run per
    segment)."""
    toks = F.col("__toks")
    segs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(seg_words)),
        lambda i: F.array_join(F.slice(toks, i, seg_words), " "),
    )
    return df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), F.posexplode(segs).alias("seg_pos", "segment"))


def boilerplate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 8,
    max_doc_freq: int = 3,
) -> DataFrame:
    """Corpus-frequency boilerplate detection (CCNet/RefinedWeb line-dedup
    shape): a segment present in more than `max_doc_freq` DISTINCT documents
    is boilerplate; emit per-doc totals. The corpus-wide frequency table is
    keyed on md5(segment) — fixed-width digests keep the shuffle rows narrow
    regardless of segment length — and the explode→count→join-back plan has
    exactly two shuffles (freq groupBy, per-doc groupBy), both with map-side
    partial aggregation."""
    segs = segment_rows(df, id_col, text_col, seg_words).withColumn(
        "__h", F.md5(F.col("segment"))
    )
    freq = segs.groupBy("__h").agg(
        F.count_distinct(F.col(id_col)).alias("__dfreq")
    )
    return (
        segs.join(freq, on="__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(
                F.when(F.col("__dfreq") > max_doc_freq, 1).otherwise(0)
            ).alias("n_boilerplate"),
        )
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_freq: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Remove corpus-frequent lines from every document and reassemble the
    text in original line order (the literal CCNet boilerplate pass, for
    corpora that do have line structure — headers, nav bars, cookie banners
    recur across pages and get stripped; unique prose survives).

    Reassembly is collect_list of (pos, line) structs + array_sort — the
    struct sort restores original order without a window. Two shuffles total
    (line-hash frequency, per-doc regroup); line identity travels as
    md5(line) so shuffle width is independent of line length."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    freq = lines.groupBy("__h").agg(
        F.count_distinct(F.col(id_col)).alias("__dfreq")
    )
    kept = lines.join(freq, on="__h").filter(F.col("__dfreq") <= max_doc_freq)
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("cleaned_text"),
            F.count(F.lit(1)).alias("n_kept_lines"),
        )
    )


#: PII patterns kept to syntax both engines' regex dialects (Java regex,
#: DuckDB RE2) interpret identically: character classes, bounded repeats,
#: word boundaries — no lookarounds, no backrefs.
EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction pass: count and replace email addresses and IPv4
    literals with typed placeholders. Pure JVM regex over one scan — the
    shape every pre-training privacy pass uses (more patterns slot in as
    additional regexp_replace stages); counts are emitted so redaction
    volume is auditable per batch without diffing text."""
    txt = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_PATTERN, "[EMAIL]"),
        IPV4_PATTERN,
        "[IP]",
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(txt, F.lit(EMAIL_PATTERN), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(txt, F.lit(IPV4_PATTERN), 0)).alias("n_ips"),
        F.md5(redacted).alias("redacted_fingerprint"),
        F.length(redacted).alias("redacted_len"),
    )


def compression_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """zlib compression-ratio quality signal (the Dolma/Gopher-family
    heuristic): highly compressible text is repetitive boilerplate or
    machine-generated filler; barely compressible text is often binary
    noise. Emits exact byte lengths, their IEEE ratio, and a
    ``repetitive_compress`` flag decided by integer cross-multiplication
    (10·compressed ≤ 3·raw ⇔ ratio ≤ 0.3) so no float sits at the boundary.

    This is the repo's canonical "genuinely needs Python" stage: zlib is not
    a SQL expression, so it runs as an Arrow-batched ``mapInPandas`` over
    one scan — embarrassingly parallel, no shuffle, fixed-width output. The
    golden-VALUES oracle replays the same zlib over the fixture
    single-process (the CDC pattern), checking batching/schema/fan-out."""
    import zlib

    import pandas as pd

    schema = (
        f"{id_col} long, raw_len long, compressed_len long, "
        "compression_ratio double, repetitive_compress boolean"
    )

    def run(batches):
        for pdf in batches:
            ids, raws, comps = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                data = (t or "").encode("utf-8")
                ids.append(i)
                raws.append(len(data))
                comps.append(len(zlib.compress(data, level)))
            out = pd.DataFrame({id_col: ids, "raw_len": raws, "compressed_len": comps})
            out["compression_ratio"] = [
                (c / r) if r else None for c, r in zip(comps, raws)
            ]
            out["repetitive_compress"] = [
                10 * c <= 3 * r for c, r in zip(comps, raws)
            ]
            yield out

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def doc_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document tf-idf keywords: the `top_k` tokens ranked by
    tf·N/df — the idf's log is monotone, so ranking by the raw rational
    (computed as ONE IEEE division of exact BIGINT products) orders
    identically to tf·idf while staying bit-identical across engines.
    Deterministic tie-break on the token.

    Plan: per-(doc, token) tf groupBy, token document-frequency derived
    from the SAME aggregate (no second corpus scan), doc count as a 1-row
    broadcast, score join keyed on the token, then a per-doc top-k window
    (WindowGroupLimit: partial top-k before the doc-key shuffle)."""
    tf = (
        df.select(
            F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, on="token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "__score",
            (F.col("tf") * F.col("__n")).cast("double") / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "df", "rank")
    )


def vocab_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Corpus vocabulary profile: the `top_k` tokens by total occurrences,
    with per-token document frequency and rank — the Zipf-curve head every
    corpus report starts with (and the input to stopword-list induction).

    One explode → one (token) groupBy with partial aggregation; the top-k is
    `orderBy().limit()`, which Spark plans as TakeOrderedAndProject —
    per-partition partial top-k merged on the driver, NO global sort and no
    single-partition window over the vocabulary. The rank window runs on the
    ≤ `top_k` surviving rows only."""
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
    )
    top = agg.orderBy(F.col("occurrences").desc(), F.col("token").asc()).limit(top_k)
    w = Window.orderBy(F.col("occurrences").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w))


def split_leakage_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    val_percent: int = 10,
    salt: str = "split:v1",
) -> DataFrame:
    """Train/validation leakage audit: (val_doc, train_doc) pairs whose BAG
    fingerprints collide — the same token multiset crossed the split
    boundary, so the validation metric is contaminated. Uses the
    order-insensitive bag fingerprint (shuffled near-copies leak just as
    hard as verbatim ones); swap in `content_fingerprint` for strict-exact
    auditing.

    The split assignment re-derives :func:`stable_split`'s md5 bucket, so
    the audit is a pure function of the corpus — no split table needs to be
    stored. Plan: one scan computing (fingerprint, split), self-join on the
    fingerprint key restricted to val×train (shuffle keyed on the digest:
    fixed-width, uniformly distributed — no skew)."""
    keyed = stable_split(df, id_col, val_percent, salt).select(
        F.col(id_col),
        F.col("split"),
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(word_tokens(F.col(text_col)))), " "
            )
        ).alias("bag_fp"),
    )
    val = keyed.filter(F.col("split") == "val").select(
        F.col(id_col).alias("val_doc_id"), "bag_fp"
    )
    train = keyed.filter(F.col("split") == "train").select(
        F.col(id_col).alias("train_doc_id"), "bag_fp"
    )
    return val.join(train, on="bag_fp").select(
        "val_doc_id", "train_doc_id", "bag_fp"
    )


def domain_quota(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 15,
    order_col: str = "n_chars",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb/C4-style source balancing): keep
    at most `quota` documents per domain, preferring the longest (then the
    smallest id for a total deterministic order). Over-represented domains —
    link farms, mirrors, crawler traps — get truncated instead of dominating
    the training mix.

    One window over (domain → order) — Spark plans the `row_number ≤ quota`
    filter as WindowGroupLimit: each map task keeps only its local top-`quota`
    per domain BEFORE the shuffle, so the exchange carries O(domains·quota)
    rows per task, not the corpus. At 100 TB that partial top-k is the
    difference between a bounded shuffle and sorting whole domains.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= quota)
        .select(id_col, domain_col, order_col, "domain_rank")
    )


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_max_count: int = 2,
) -> DataFrame:
    """Corpus unigram-LM quality scoring (the CCNet perplexity-filter shape
    with an exactly-replayable score): fit a unigram model ON the corpus
    itself (token → occurrence count), then score each document by how
    frequent its tokens are on average. Low-score docs are gibberish, OCR
    noise, or boilerplate-free word soup — the same population a KenLM
    perplexity filter drops.

    All decision arithmetic is exact integers so the keep flag is
    bit-identical across engines (no log/exp at the boundary):

    - ``freq_sum``  = Σ over doc tokens of corpus count(token)
    - ``rare_tokens`` = tokens with corpus count ≤ `rare_max_count`
    - ``keep`` ⇔ freq_sum·vocab ≥ n_tokens·total_occurrences — i.e. the
      doc's mean token frequency clears the corpus-wide mean frequency per
      vocabulary entry (cross-multiplied, no division).

    Plan shape: one corpus scan exploded to (doc, token); token frequencies
    are a groupBy on the token key; the score join re-uses that same token
    partitioning (co-partitioned exchange, no second corpus-wide shuffle
    pattern); the global (total, vocab) aggregate is ONE row, broadcast. At
    100 TB the vocabulary is far too large to broadcast — the token-key hash
    join is exactly right — while the model "fit" stays a partial-aggregated
    count, the cheapest possible LM.
    """
    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__tok")
    )
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__tf"))
    glob = freq.agg(
        F.sum("__tf").alias("__g_occ"), F.count(F.lit(1)).alias("__g_vocab")
    )
    per_doc = (
        toks.join(freq, on="__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__tf").alias("freq_sum"),
            F.sum(
                F.when(F.col("__tf") <= rare_max_count, 1).otherwise(0)
            ).alias("rare_tokens"),
        )
    )
    return per_doc.join(F.broadcast(glob)).select(
        id_col,
        "n_tokens",
        "freq_sum",
        "rare_tokens",
        (
            F.col("freq_sum").cast("double") / F.col("n_tokens").cast("double")
        ).alias("mean_token_freq"),
        (
            F.col("freq_sum") * F.col("__g_vocab")
            >= F.col("n_tokens") * F.col("__g_occ")
        ).alias("keep"),
    )


#: Kneser-Ney absolute discount D = 3/4 (Chen & Goodman 1999's canonical
#: value), kept as the integer pair (numerator 3, denominator 4) so every
#: smoothed probability is a ratio of int64 products — no float enters the
#: model.  Probabilities are emitted on a parts-per-billion integer grid
#: (two per-term floor divisions, see kn_bigram_scores); 1e9 = 4 * KN_PPB_Q.
KN_PPB_Q = 250_000_000


def kn_bigram_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Kneser-Ney smoothed bigram-LM quality scoring — the properly-smoothed
    sibling of :func:`bigram_lm_scores` (which is raw MLE counts): interpolated
    KN (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.26) with absolute
    discount D = 3/4 and the CONTINUATION unigram as the backoff
    distribution, the estimator every production n-gram LM (KenLM, the CCNet
    filter's model) actually uses.  For each observed bigram (w1, w2):

        P_KN = max(c(w1,w2) - D, 0) / c(w1·)
             + (D · N1+(w1·) / c(w1·)) · (N1+(·w2) / T)

    where c(w1·) = Σ_y c(w1,y), N1+(w1·) = |{y : c(w1,y) > 0}|,
    N1+(·w2) = |{x : c(x,w2) > 0}| and T = total distinct bigram types.
    With D = 3/4 every term is a ratio of integers, so the probability is
    quantized to a parts-per-billion grid with one floor division per term
    (the two-floor sum is the DEFINED spec both engines replay — no float
    anywhere in the model, the unigram_lm_scores discipline applied to a
    genuinely smoothed estimator):

        p_ppb = (max(4c−3, 0) · 250_000_000) div c(w1·)
              + (3 · N1+(w1·) · N1+(·w2) · 250_000_000) div (c(w1·) · T)

    Per document: bigram count, Σ p_ppb, min p_ppb (the single most
    surprising transition), novel bigrams (corpus count 1 — this doc alone
    contributes them), integer mean, and ``keep`` ⇔ doc mean ppb ≥ corpus
    mean ppb (two floor divisions compared — no float at the boundary).
    Documents with fewer than 2 tokens emit no row (nothing to score), as
    in :func:`bigram_lm_scores`.

    Plan shape: corpus exploded once to (doc, w1, w2) via a zip of two
    array slices (no self-join for adjacency); the model fit is three
    map-side-combined groupBys (bigram key, then its two marginals — each
    input already the compacted TYPE table, far smaller than occurrences);
    T is a 1-row broadcast; the score join back to occurrences re-uses the
    bigram-key partitioning.  All shuffles are key-hashed and linear; at
    100 TB the bigram-type table is the only state and it grows
    sub-linearly in corpus size (Heaps' law).  int64 headroom: the largest
    product is 3 · N1+ · N1+ · 2.5e8 — safe to vocab ~10^5 per marginal;
    past that swap the two products to DECIMAL(38,0) (documented dial, the
    pmi_collocations overflow-guard discipline).
    """
    toks = F.col("__toks")
    pairs_arr = F.when(
        F.size(toks) >= 2,
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
            F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = (
        df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode(pairs_arr).alias("__p"))
        .select(F.col(id_col), F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    fwd = big.groupBy("w1").agg(
        F.sum("c_xy").alias("c_w1"), F.count(F.lit(1)).alias("n1p_fw")
    )
    bwd = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
    types = big.agg(F.count(F.lit(1)).alias("__t_types"))
    scored = (
        big.join(fwd, "w1")
        .join(bwd, "w2")
        .join(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                F.expr(f"(greatest(4 * c_xy - 3, 0L) * {KN_PPB_Q}L) div c_w1")
                + F.expr(
                    f"(3 * n1p_fw * n1p_bw * {KN_PPB_Q}L) div (c_w1 * __t_types)"
                )
            ).alias("p_ppb"),
        )
    )
    per_doc = (
        pairs.join(scored, on=["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_ppb").alias("sum_ppb"),
            F.min("p_ppb").alias("min_ppb"),
            F.sum(F.when(F.col("c_xy") <= 1, 1).otherwise(0)).alias(
                "novel_bigrams"
            ),
        )
    )
    glob = per_doc.agg(
        F.sum("sum_ppb").alias("__g_sum"), F.sum("n_bigrams").alias("__g_n")
    )
    return per_doc.join(F.broadcast(glob)).select(
        id_col,
        "n_bigrams",
        "sum_ppb",
        "min_ppb",
        "novel_bigrams",
        F.expr("sum_ppb div n_bigrams").alias("mean_ppb"),
        (
            F.expr("sum_ppb div n_bigrams") >= F.expr("__g_sum div __g_n")
        ).alias("keep"),
    )


def kn_trigram_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM LM quality scoring — the ≥3-gram
    ladder rung production perplexity filters actually run (KenLM / the
    CCNet filter are 5-gram KN; :func:`kn_bigram_scores` is the 2-gram
    rung).  Chen & Goodman 1999 interpolated KN with absolute discount
    D = 3/4 at both discounted levels and CONTINUATION counts for the
    lower orders, all statistics drawn from the trigram TYPE table:

        P3(w3|w1w2) = max(c(w1w2w3) − D, 0)/c(w1w2·)
                    + D·N1+(w1w2·)/c(w1w2·) · P2(w3|w2)
        P2(w3|w2)   = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
                    + D·N1+(w2·*)/N1+(·w2·) · P1(w3)
        P1(w3)      = N1+(·w3) / T

    where N1+(·w2w3) = distinct left contexts of the trigram type,
    N1+(·w2·) = trigram types with middle w2, N1+(w2·*) = distinct w3
    continuing w2, N1+(·w3) = distinct w2 preceding w3 (over continuation
    types) and T = distinct (w2,w3) continuation types.  With D = 3/4
    every term is a ratio of int64 products; the DEFINED cross-engine
    spec quantizes each LEVEL to a parts-per-billion grid with floor
    divisions (nested floors are part of the spec, exactly as the
    two-floor sum is in :func:`kn_bigram_scores`):

        p1_ppb = (N1+(·w3) · 10^9)                div T
        p2_ppb = (max(4·ĉ − 3, 0) · 2.5·10^8)     div N1+(·w2·)
               + (3 · N1+(w2·*) · p1_ppb)          div (4 · N1+(·w2·))
        p3_ppb = (max(4·c − 3, 0) · 2.5·10^8)     div c(w1w2·)
               + (3 · N1+(w1w2·) · p2_ppb)         div (4 · c(w1w2·))

    int64 headroom: the largest products are 3 · N1+ · p_ppb ≤ 3·V·10^9 —
    safe to per-context vocabulary V ~ 10^5 (the kn_bigram documented
    dial; past that, DECIMAL(38,0) the two products).

    Per document: trigram count, Σ p3_ppb, min p3_ppb, novel trigrams
    (corpus count 1), integer mean, ``keep`` ⇔ doc mean ≥ corpus mean.
    Documents with fewer than 3 tokens emit no row.

    Plan shape: corpus exploded once to (doc, w1, w2, w3) via a zip of
    three array slices; the fit is five map-side-combined groupBys, each
    over the progressively smaller TYPE table (trigram types → (w2,w3)
    continuation types → per-key marginals); T is a 1-row broadcast; the
    score join back to occurrences reuses the trigram-key partitioning.
    All shuffles key-hashed and linear; state is the trigram type table
    (Heaps-law sublinear at 100 TB).
    """
    toks = F.col("__toks")
    tri_arr = F.when(
        F.size(toks) >= 3,
        F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 2).alias("w1"),
            F.slice(toks, 2, F.size(toks) - 2).alias("w2"),
            F.slice(toks, 3, F.size(toks) - 2).alias("w3"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    occ = (
        df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode(tri_arr).alias("__p"))
        .select(
            F.col(id_col),
            F.col("__p.w1").alias("w1"),
            F.col("__p.w2").alias("w2"),
            F.col("__p.w3").alias("w3"),
        )
    )
    tri = occ.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c12"), F.count(F.lit(1)).alias("n1p_12")
    )
    cont = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n_ctx23"))
    mid = cont.groupBy("w2").agg(
        F.sum("n_ctx23").alias("n_mid"), F.count(F.lit(1)).alias("n1p_fw2")
    )
    bw3 = cont.groupBy("w3").agg(F.count(F.lit(1)).alias("n1p_bw3"))
    t23 = cont.agg(F.count(F.lit(1)).alias("__t23"))
    scored = (
        tri.join(ctx, ["w1", "w2"])
        .join(cont, ["w2", "w3"])
        .join(mid, "w2")
        .join(bw3, "w3")
        .join(F.broadcast(t23))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            (
                F.expr(f"(greatest(4 * n_ctx23 - 3, 0L) * {KN_PPB_Q}L) div n_mid")
                + F.expr(
                    "(3 * n1p_fw2 * ((n1p_bw3 * 1000000000L) div __t23)) "
                    "div (4 * n_mid)"
                )
            ).alias("__p2_ppb"),
            F.col("c12"),
            F.col("n1p_12"),
        )
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            (
                F.expr(f"(greatest(4 * c3 - 3, 0L) * {KN_PPB_Q}L) div c12")
                + F.expr("(3 * n1p_12 * __p2_ppb) div (4 * c12)")
            ).alias("p_ppb"),
        )
    )
    per_doc = (
        occ.join(scored, on=["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("p_ppb").alias("sum_ppb"),
            F.min("p_ppb").alias("min_ppb"),
            F.sum(F.when(F.col("c3") <= 1, 1).otherwise(0)).alias(
                "novel_trigrams"
            ),
        )
    )
    glob = per_doc.agg(
        F.sum("sum_ppb").alias("__g_sum"), F.sum("n_trigrams").alias("__g_n")
    )
    return per_doc.join(F.broadcast(glob)).select(
        id_col,
        "n_trigrams",
        "sum_ppb",
        "min_ppb",
        "novel_trigrams",
        F.expr("sum_ppb div n_trigrams").alias("mean_ppb"),
        (
            F.expr("sum_ppb div n_trigrams") >= F.expr("__g_sum div __g_n")
        ).alias("keep"),
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, ns: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 "repetition
    removal"; also RefinedWeb/Dolma): for each n in `ns`, the most-repeated
    word n-gram's occurrence count, the total n-gram count, and the
    characters covered by DUPLICATED n-grams (Σ over grams occurring ≥2 of
    count·len) alongside the total n-gram characters — the four exact
    integers behind "fraction of characters in duplicate n-grams". The
    `repetitive` flag applies Gopher's thresholds (top-2-gram ≤ 20%,
    top-3-gram ≤ 18%, dup-4-gram chars ≤ 16%) as integer cross-
    multiplications, so the keep decision is bit-identical across engines.

    Repetition is DOC-LOCAL, so no corpus-wide shuffle exists in the plan at
    all: per row, each n's grams are sorted and run-length encoded with
    array expressions (sort → run starts → (count, gram) runs), and the four
    integers fold over the runs — one scan, embarrassingly parallel, linear
    at any corpus size. (The previous implementation exploded ~Σ|doc| gram
    rows into a (doc, n, gram) count shuffle — correct, but it moved the
    whole token stream through the exchange for a per-document statistic.)
    Docs shorter than n words contribute zero counts for that n and pass
    the corresponding rule vacuously.
    """
    work = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    for n in ns:
        # sorted gram array (empty when the doc is shorter than n words)
        work = work.withColumn(
            f"__s{n}",
            F.expr(
                f"CASE WHEN size(__toks) >= {n} THEN "
                f"array_sort(transform(sequence(1, size(__toks) - {n} + 1), "
                f"i -> array_join(slice(__toks, i, {n}), ' '))) "
                "ELSE cast(array() as array<string>) END"
            ),
        )
        # run starts: positions where the sorted value changes (IF keeps
        # element_at(s, 0) from ever evaluating; sequence(1, 0) would count
        # DOWN, hence the empty-array guard)
        work = work.withColumn(
            f"__st{n}",
            F.expr(
                f"CASE WHEN size(__s{n}) = 0 THEN cast(array() as array<int>) "
                f"ELSE filter(sequence(1, size(__s{n})), i -> IF(i = 1, true, "
                f"element_at(__s{n}, i) != element_at(__s{n}, i - 1))) END"
            ),
        )
        # (count, gram) runs: each start paired with the next start (or end)
        work = work.withColumn(
            f"__r{n}",
            F.expr(
                f"CASE WHEN size(__st{n}) = 0 THEN "
                "cast(array() as array<struct<c:int,g:string>>) ELSE "
                f"zip_with(__st{n}, concat(slice(__st{n}, 2, size(__st{n})), "
                f"array(size(__s{n}) + 1)), "
                f"(a, b) -> struct(b - a as c, element_at(__s{n}, a) as g)) END"
            ),
        )
    out_cols = [F.col(id_col)]
    for n in ns:
        out_cols.extend(
            [
                F.expr(
                    f"IF(size(__r{n}) = 0, CAST(0 AS BIGINT), "
                    f"CAST(array_max(transform(__r{n}, r -> r.c)) AS BIGINT))"
                ).alias(f"top{n}_count"),
                F.expr(f"CAST(size(__s{n}) AS BIGINT)").alias(f"n_{n}grams"),
                F.expr(
                    f"aggregate(__r{n}, CAST(0 AS BIGINT), (acc, r) -> acc + "
                    "IF(r.c >= 2, CAST(r.c AS BIGINT) * length(r.g), "
                    "CAST(0 AS BIGINT)))"
                ).alias(f"dup{n}_chars"),
                F.expr(
                    f"aggregate(__r{n}, CAST(0 AS BIGINT), (acc, r) -> acc + "
                    "CAST(r.c AS BIGINT) * length(r.g))"
                ).alias(f"tot{n}_chars"),
            ]
        )
    wide = work.select(*out_cols)
    # Gopher thresholds, each applied only when its n size was requested
    rules = []
    if 2 in ns:
        rules.append(5 * F.col("top2_count") <= F.col("n_2grams"))
    if 3 in ns:
        rules.append(50 * F.col("top3_count") <= 9 * F.col("n_3grams"))
    if 4 in ns:
        rules.append(25 * F.col("dup4_chars") <= 4 * F.col("tot4_chars"))
    clean = rules[0] if rules else F.lit(True)
    for r in rules[1:]:
        clean = clean & r
    return wide.withColumn("repetitive", ~clean)


def anchor_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    anchor_len: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Cross-document exact-substring duplication via rare-anchor sampling —
    the distributed shape of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    A full distributed suffix array is the exact tool; its Spark-feasible
    surrogate samples fixed-width ANCHORS (length `anchor_len`, every
    `stride` chars) from each document and calls an anchor duplicated when
    the identical substring occurs in ≥ 2 distinct documents. A duplicated
    span of length L ≥ anchor_len + stride − 1 is guaranteed to contribute
    ≥ ⌊(L − anchor_len)/stride⌋ + 1 shared anchors on both sides (the
    anchor grid is phase-aligned per document, so only spans starting at
    equal phase match exactly — the standard recall/cost dial: smaller
    stride, higher recall, more rows).

    Returns per-doc (n_anchors, dup_anchors, dup_char_estimate ≈ stride ×
    dup_anchors) — the per-document duplicated-substring mass a curation
    pass thresholds on, complementing `boilerplate_span_stats` (which keys
    on whole segments) with sub-segment granularity.

    Scale shape: one generator explode (len/stride rows per doc), one
    digest-keyed aggregation for the corpus frequency table (md5 keys —
    uniform, no skew), one join back + per-doc aggregation. Everything is
    linear in corpus size; anchors are md5 digests so the shuffle carries
    fixed-width keys and any engine replays them.
    """
    from aci_export_spark.llm.dedup import spread_for_explode

    n = F.length(F.col(text_col))
    positions = spread_for_explode(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.when(
                n >= anchor_len,
                F.sequence(F.lit(1), n - (anchor_len - 1), F.lit(stride)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__pos"),
    )
    anch = positions.select(
        F.col(id_col),
        F.md5(F.col(text_col).substr(F.col("__pos"), F.lit(anchor_len))).alias("__d"),
    )
    freq = anch.groupBy("__d").agg(
        F.count_distinct(F.col(id_col)).alias("__nd")
    )
    per = (
        anch.join(freq, on="__d")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum(F.when(F.col("__nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_anchors"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_anchors", F.lit(0)).cast("long").alias("n_anchors"),
            F.coalesce("dup_anchors", F.lit(0)).cast("long").alias("dup_anchors"),
            (F.coalesce("dup_anchors", F.lit(0)) * stride)
            .cast("long")
            .alias("dup_char_estimate"),
        )
    )


def dsir_affinity(
    raw,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    salt: str = "dsir:v1",
):
    """DSIR-style domain-affinity sufficient statistics (Xie et al.,
    NeurIPS 2023 "Data Selection for Language Models via Importance
    Resampling"): hash each document's word n-grams into ``buckets``
    md5-buckets and score every RAW document against a fixed TARGET
    domain's hashed-feature distribution.

    Output (id, n_features, affinity_target, affinity_raw) where
    affinity_target = Σ_positions c_target(bucket) and affinity_raw =
    Σ_positions c_raw(bucket) — the exact INTEGER sufficient statistics of
    the importance weight (DSIR's log p_target(f) − log p_raw(f) fold is
    one float pass over these at the caller, where smoothing/temperature
    choices belong; keeping logs out preserves the exact-oracle
    discipline). Documents shorter than n words come back zeroed — a
    total assignment.

    100 TB shape: the target side is a BENCHMARK set — constant-size by
    contract — so its bucket table broadcasts at any corpus scale; the raw
    bucket table aggregates to at most ``buckets`` rows (map-side combine
    over uniform md5 keys) and broadcasts too. The per-document score is
    then one explode + two broadcast joins + one doc-key aggregation: the
    corpus is never shuffled on anything wider than its own doc key."""
    from pyspark.sql import functions as F

    def feats(df):
        g = word_ngram_rows(df, id_col, text_col, n=n, distinct=False)
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + ":"), F.col("gram"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % buckets
        )
        return g.select(F.col(id_col), bucket.alias("bucket"))

    tgt = feats(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    rawf = feats(raw)
    craw = rawf.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    per = (
        rawf.join(F.broadcast(tgt), on="bucket", how="left")
        .join(F.broadcast(craw), on="bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce(F.col("c_t"), F.lit(0))).alias("affinity_target"),
            F.sum("c_r").alias("affinity_raw"),
        )
    )
    return (
        raw.select(id_col)
        .distinct()
        .join(per, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("affinity_target", F.lit(0)).alias("affinity_target"),
            F.coalesce("affinity_raw", F.lit(0)).alias("affinity_raw"),
        )
    )


def chisq_feature_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    min_df: int = 5,
    k: int = 15,
) -> DataFrame:
    """Chi-square (χ²) feature selection: the top-k terms most associated
    with each domain by the exact 2×2 contingency statistic — the classic
    supervised vocabulary selector for domain classifiers and quality
    routers (Yang & Pedersen ICML'97 established χ² as the strongest of
    the standard selectors).

    For term t and domain s over N docs, with n11 = docs of s containing
    t, n1_ = docs containing t, n_1 = docs in s:

        χ² = N · (n11·n22 − n12·n21)² / (n1_ · (N−n1_) · n_1 · (N−n_1))

    Float discipline (the pmi_collocations pattern): numerator and
    denominator are exact integers, computed in DECIMAL(38,0) and checked
    against the BIGINT range with an explicit raise — χ²'s value never
    decides anything here; the RANK uses the one-IEEE-division ratio
    (identical doubles from identical ints in both engines) with the term
    string as tie-break. At corpus sizes where N⁵/16 outgrows int64 the
    query FAILS LOUDLY (like the ANSI/DuckDB oracle) — rerank per-domain
    in log space there (log χ² is monotone), the documented 100 TB dial.

    Plan shape: one corpus scan explodes distinct (doc, term) presence
    rows; term totals and (term, domain) cells are two map-side-combined
    groupBys on the term key; domain totals and N are domain-cardinality
    broadcasts; per-domain top-k is a PARTITIONED window over rows already
    reduced to (term × domain) cardinality — never a global sort and
    never a doc-cardinality window."""
    pres = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.array_distinct(word_tokens(F.col(text_col)))).alias(
                "term"
            ),
            F.col(id_col),
        )
        .groupBy("domain", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n11"))
    )
    term_tot = pres.groupBy("term").agg(F.sum("n11").cast("long").alias("n1_"))
    dom_docs = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_1")
    )
    n_total = df.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))

    def _dec(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    def _checked_long(c: Column, what: str) -> Column:
        return (
            F.when(
                c.isNull() | (c > F.lit(2**63 - 1).cast("decimal(38,0)")),
                F.raise_error(
                    F.lit(
                        f"chisq_feature_terms: {what} overflows BIGINT — "
                        "rerank per-domain in log space at this corpus size"
                    )
                ).cast("decimal(38,0)"),
            )
            .otherwise(c)
            .cast("long")
        )

    n12 = F.col("n1_") - F.col("n11")
    n21 = F.col("n_1") - F.col("n11")
    n22 = F.col("n_tot") - F.col("n1_") - n21
    diff = _dec(F.col("n11")) * _dec(n22) - _dec(n12) * _dec(n21)
    num = _dec(F.col("n_tot")) * diff * diff
    den = (
        _dec(F.col("n1_"))
        * _dec(F.col("n_tot") - F.col("n1_"))
        * _dec(F.col("n_1"))
        * _dec(F.col("n_tot") - F.col("n_1"))
    )
    scored = (
        pres.join(term_tot.filter(F.col("n1_") >= min_df), on="term")
        .join(F.broadcast(dom_docs), on="domain")
        .join(F.broadcast(n_total))
        # keep only POSITIVE association (the term is over-represented in
        # the domain): χ² is sign-blind after squaring, but a domain
        # vocabulary selector wants characteristic terms, not absences —
        # exact integer cross-multiplication, no division
        .filter(
            _dec(F.col("n11")) * _dec(F.col("n_tot"))
            > _dec(F.col("n1_")) * _dec(F.col("n_1"))
        )
        .select(
            "domain",
            "term",
            "n11",
            "n1_",
            "n_1",
            "n_tot",
            _checked_long(num, "N * (ad-bc)^2").alias("chi2_num"),
            _checked_long(den, "margin product").alias("chi2_den"),
            (num.cast("double") / den.cast("double")).alias("__ratio"),
        )
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("__ratio").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "domain", "term", "n11", "n1_", "n_1", "chi2_num", "chi2_den",
            "rank",
        )
    )
