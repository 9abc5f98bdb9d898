"""Byte-pair-encoding merge training as distributed aggregations.

The classic tokenizer-training loop (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from character
sequences per word type, repeatedly count adjacent symbol pairs (weighted by
word frequency) and merge the most frequent pair, emitting the merge table —
the model artifact a BPE tokenizer ships.

Scale design (100 TB):
- the corpus is reduced ONCE to the word-type table (word, count) — the only
  corpus-scale shuffle; every merge round then aggregates over vocabulary-
  sized data (word types, not tokens). Production tokenizer training bounds
  this further by sampling the corpus first; the operator is agnostic.
- per round: one map-side-combined pair-count aggregation + one 1-row argmax
  collect (the connected-components convergence idiom — bounded by the
  n_merges hyperparameter, not by data) + one fold-transform over the symbol
  arrays, `localCheckpoint`ed so lineage stays flat across rounds.
- the merge substitution is a sequential `aggregate` fold per word —
  left-to-right non-overlapping greedy, the reference semantics — executed
  as JVM expressions (no Python in the loop).

Everything is deterministic: ties in the argmax break on (left, right)
lexicographic order, so an independent single-process implementation
(:func:`bpe_reference_python`) reproduces the merge table exactly — that
backs the golden-VALUES oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

from aci_export_spark.llm.dedup import word_tokens

#: end-of-word marker, per the reference algorithm (distinguishes "est</w>"
#: in "highest" from "est" in "estimate")
EOW = "</w>"


def _local_train_types_bound() -> int:
    """Word-TYPE count at or below which the merge-training round loop runs
    on the driver over the collected word-type table instead of as
    per-round distributed jobs (the connected-components size-conditioned
    fast-path discipline, graph.py).

    Why: each distributed round costs one aggregation job (ranked pair
    collect) plus one eager localCheckpoint job, and every round's batch
    fold is a FRESH codegen unit — at a vocabulary of a few dozen word
    types (the synthetic bench corpus saturates at 31), ~20 rounds are
    pure job-barrier + janino-compile overhead over kilobytes of data.
    The gate reads the EXACT observed type count from the already-
    checkpointed word table; above it the distributed path is untouched,
    so corpus-scale vocabularies (real corpora hold 10^5..10^9 types at
    100 TB) never serialize onto the driver. Env-tunable; 0 disables."""
    return int(os.environ.get("SPARK_GRAFT_LOCAL_TRAIN_TYPES", "2048"))


def _collect_word_entries(
    words: DataFrame, bound: int
) -> list[list] | None:
    """Collect the checkpointed word-type table (symbols, wcount, base_len)
    iff it holds at most ``bound`` rows; None otherwise. One bounded-limit
    job against the checkpoint — never a corpus rescan."""
    if bound <= 0:
        return None
    rows = words.limit(bound + 1).collect()
    if len(rows) > bound:
        return None
    return [
        [tuple(r["symbols"]), int(r["wcount"]), int(r["base_len"])]
        for r in rows
    ]


def _apply_merge_local(
    entries: list[list], left: str, right: str, merged: str
) -> None:
    """In-place left-to-right non-overlapping substitution over every word
    entry — the same greedy the JVM fold applies per row. Entries are
    per-WORD rows (never collapsed), exactly mirroring the distributed
    table where each word type keeps its own row through every fold."""
    for e in entries:
        syms = e[0]
        # fast skip: the pair can only occur if both symbols are present
        if left not in syms or right not in syms:
            continue
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = merged
            else:
                out.append(x)
        e[0] = tuple(out)


def _local_pair_counts(entries: list[list]) -> dict:
    from collections import Counter

    stats: Counter = Counter()
    for syms, wc, _bl in entries:
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] += wc
    return stats


def _words_df_from_entries(
    spark: SparkSession, entries: list[list]
) -> DataFrame:
    """The final encoded word-type table as a DataFrame, schema-identical
    to the distributed fold output (symbols array<string>, wcount bigint,
    base_len int)."""
    return local_rows_df(
        spark,
        [(list(syms), wc, bl) for syms, wc, bl in entries],
        schema="symbols array<string>, wcount bigint, base_len int",
    )


def _word_type_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, wcount) — one row per distinct word, symbols
    initialized to characters + the end-of-word marker."""
    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    chars = F.expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), "
        f"array('{EOW}'))"
    )
    return words.select(chars.alias("symbols"), "wcount")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: explode
    zip(symbols[:-1], symbols[1:]) and sum — partial aggregation combines
    map-side before the one shuffle."""
    pairs = F.expr(
        "zip_with(slice(symbols, 1, size(symbols) - 1), "
        "slice(symbols, 2, size(symbols) - 1), "
        "(a, b) -> struct(a as left, b as right))"
    )
    return (
        words.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "wcount")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def _q(s: str) -> str:
    """Spark SQL single-quoted string literal for an arbitrary symbol.

    Backslash MUST be escaped before the quote doubling: with the default
    ``spark.sql.parser.escapedStringLiterals=false`` Spark treats ``\\`` in a
    literal as an escape introducer (an unknown escape like ``\\b`` silently
    drops the backslash), so an unescaped symbol containing ``\\`` would
    produce a literal that never equals the actual array value and the fold
    would silently skip the merge while the pure-Python reference applies it.
    """
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _merge_fold_sql(left: str, right: str) -> str:
    """Left-to-right non-overlapping substitution of the (left, right)
    symbol pair with their concatenation, as one sequential fold."""

    merged = _q(left + right)
    return (
        "aggregate(symbols, cast(array() as array<string>), (acc, x) -> "
        f"if(size(acc) > 0 AND element_at(acc, -1) = {_q(left)} AND x = {_q(right)}, "
        f"concat(slice(acc, 1, size(acc) - 1), array({merged})), "
        "concat(acc, array(x))))"
    )


def bpe_train_with_encoded(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Run the merge-training loop and return BOTH artifacts it produces:
    the merge table (see :func:`bpe_train`) and the FINAL folded word-type
    table — i.e. every distinct word already encoded with all learned
    merges, with its original symbol length (`base_len`) and corpus
    frequency (`wcount`). The trainer computes that table anyway (it is
    round N's fold output); returning it makes corpus-wide encode
    statistics a vocabulary-sized aggregation instead of a second
    corpus-wide encode pass."""
    spark = docs.sparkSession
    words = (
        _word_type_table(docs, text_col)
        .withColumn("base_len", F.size("symbols"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    entries = _collect_word_entries(words, _local_train_types_bound())
    if entries is not None:
        # size-conditioned fast path (see _local_train_types_bound): the
        # identical greedy spec over the collected table — top-1 pair by
        # (count desc, left, right), sequential substitution — with zero
        # per-round jobs. Equivalence to the distributed loop is
        # randomized-tested (tests/test_bpe_local_fast_path.py).
        for r in range(1, n_merges + 1):
            stats = _local_pair_counts(entries)
            if not stats:
                break
            (left, right), cnt = min(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((r, left, right, int(cnt)))
            _apply_merge_local(entries, left, right, left + right)
        merge_df = local_rows_df(
            spark,
            merges,
            schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
        )
        return merge_df, _words_df_from_entries(spark, entries)
    for r in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((r, left, right, int(cnt)))
        words = words.withColumn(
            "symbols", F.expr(_merge_fold_sql(left, right))
        ).localCheckpoint(eager=True)
    merge_df = local_rows_df(
        spark,
        merges,
        # left/right are SQL keywords — suffix them so the DuckDB oracle and
        # any SQL consumer can reference the columns unquoted
        schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )
    return merge_df, words


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Train `n_merges` BPE merges over the corpus; returns the merge table
    (merge_rank, left, right, pair_count) — tiny by construction (the merge
    count is a hyperparameter), assembled on the driver like any fitted
    model artifact (the kmeans-quantizer discipline). Stops early if the
    corpus degenerates to single-symbol words."""
    merge_df, _ = bpe_train_with_encoded(docs, text_col, n_merges)
    return merge_df


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Corpus-wide tokenizer-efficiency report: train `n_merges` merges,
    encode the corpus with them, and reduce to ONE exact-integer row —
    (n_words, n_base_symbols, n_encoded_symbols). The compression the
    merge table buys, as the numbers a data-pipeline owner actually tracks
    (symbols ≈ sequence length ≈ training cost).

    Plan shape: the corpus reduces once to the word-TYPE table (the
    trainer's own shuffle); encoding happens on word types (vocabulary-
    sized), weighted by `wcount` in the final aggregate — no second
    corpus pass, no per-token row ever materialized.
    """
    _, words = bpe_train_with_encoded(docs, text_col, n_merges)
    return encoded_words_stats(words)


def encoded_words_stats(words: DataFrame) -> DataFrame:
    """Reduce an encoded word-type table (symbols, base_len, wcount) to the
    one-row (n_words, n_base_symbols, n_encoded_symbols) report."""
    return words.agg(
        F.coalesce(F.sum("wcount"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.sum(F.col("base_len") * F.col("wcount")), F.lit(0))
        .cast("long")
        .alias("n_base_symbols"),
        F.coalesce(F.sum(F.size("symbols") * F.col("wcount")), F.lit(0))
        .cast("long")
        .alias("n_encoded_symbols"),
    )


def _select_compatible(
    ranked: list[tuple[str, str, int]],
    room: int,
) -> list[tuple[str, str, int]]:
    """Greedy prefix selection of mutually NON-INTERACTING pairs from a
    ranked pair list — the batching core shared (as a spec) with the pure-
    Python reference.

    Two pairs interact when applying one can change the other's occurrence
    count: merging (a,b)→"ab" only destroys adjacencies touching `a` or `b`
    and only creates adjacencies touching the new symbol "ab". So a later
    pair is safe iff neither of its symbols is a symbol of ANY earlier
    selected pair (`used`) nor the concatenation an earlier merge produces
    (`produced`). For such a batch, every selected pair's round-start count
    is provably still exact at the moment it applies — the recorded
    pair_count column stays truthful."""
    used: set[str] = set()
    produced: set[str] = set()
    selected: list[tuple[str, str, int]] = []
    for left, right, cnt in ranked:
        if len(selected) >= room:
            break
        if left in used or right in used or left in produced or right in produced:
            continue
        selected.append((left, right, cnt))
        used.update((left, right))
        produced.add(left + right)
    return selected


def _batch_fold_sql(selected: list[tuple[str, str, int]]) -> str:
    """One JVM expression applying a whole merge batch in rank order: an
    outer fold over the merge list (a LITERAL array of structs — expression
    size is constant in batch size, unlike chaining one aggregate per
    merge) whose accumulator is the symbols array, with the inner fold
    doing the usual left-to-right greedy substitution."""
    arr = "array(" + ", ".join(
        f"named_struct('l', {_q(l)}, 'r', {_q(r)}, 'm', {_q(l + r)})"
        for l, r, _ in selected
    ) + ")"
    return (
        f"aggregate({arr}, symbols, (syms, mg) -> "
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        "if(size(acc) > 0 AND element_at(acc, -1) = mg.l AND x = mg.r, "
        "concat(slice(acc, 1, size(acc) - 1), array(mg.m)), "
        "concat(acc, array(x)))))"
    )


def bpe_train_batched_with_encoded(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    batch_cap: int = 32,
    scan_cap: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Batched BPE training — the realistic-vocabulary variant of
    :func:`bpe_train_with_encoded`, returning (merge table, final encoded
    word-type table, n_rounds).

    The sequential trainer does one 1-row driver collect PER MERGE — fine
    at hyperparameter-toy n_merges=8, untenable at a 32k-entry production
    vocabulary (32k sequential round trips). This variant is the standard
    frequency-frozen parallel-BPE step: each round collects the top
    `scan_cap` pairs ONCE, greedily selects up to `batch_cap` mutually
    non-interacting pairs from that ranked prefix (see
    :func:`_select_compatible` — non-interaction guarantees each selected
    pair's recorded count is still exact when it applies), applies the
    whole batch as ONE data-driven JVM fold, and checkpoints. Driver round
    trips are therefore O(n_merges / batch-yield), sublinear in merges; the
    per-round collect is `scan_cap` rows, not the pair table.

    Equivalence contract: with batch_cap=1 this IS classic greedy BPE
    (rank-1 pair per round). At batch_cap>1 the merge INVENTORY can differ
    from strictly-sequential BPE — a merge's product pair (e.g. "t"+"h" →
    "th", then ("th","e")) only becomes a candidate next round — which is
    the documented, deterministic trade every parallel BPE trainer makes
    (frequencies frozen within a round). The pure-Python golden reference
    (:func:`bpe_reference_python_batched`) implements the identical spec,
    so the oracle is exact, not approximate.

    Early-stop: training ends when the pair table runs dry (every word
    type fully merged) — on a bounded synthetic vocabulary that can happen
    before `n_merges`, and the reference stops at the same point.
    """
    spark = docs.sparkSession
    if scan_cap is None:
        scan_cap = 4 * batch_cap
    words = (
        _word_type_table(docs, text_col)
        .withColumn("base_len", F.size("symbols"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    entries = _collect_word_entries(words, _local_train_types_bound())
    while len(merges) < n_merges:
        if entries is not None:
            stats = _local_pair_counts(entries)
            ranked = [
                (l, r, int(c))
                for (l, r), c in sorted(
                    stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
                )[:scan_cap]
            ]
        else:
            ranked_rows = (
                _pair_counts(words)
                .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
                .limit(scan_cap)
                .collect()
            )
            ranked = [
                (r["left"], r["right"], int(r["pair_count"])) for r in ranked_rows
            ]
        if not ranked:
            break
        selected = _select_compatible(ranked, min(batch_cap, n_merges - len(merges)))
        if not selected:
            break
        rounds += 1
        for left, right, cnt in selected:
            merges.append((len(merges) + 1, left, right, cnt))
        if entries is not None:
            # in-rank-order sequential application — the same per-word
            # result as the distributed outer fold (non-interacting batch)
            for left, right, _cnt in selected:
                _apply_merge_local(entries, left, right, left + right)
        else:
            words = words.withColumn(
                "symbols", F.expr(_batch_fold_sql(selected))
            ).localCheckpoint(eager=True)
    if entries is not None:
        words = _words_df_from_entries(spark, entries)
    merge_df = local_rows_df(
        spark,
        merges,
        schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )
    return merge_df, words, rounds


def bpe_reference_python_batched(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 256,
    batch_cap: int = 32,
    scan_cap: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], int]:
    """Single-process reference for :func:`bpe_train_batched_with_encoded`:
    identical tokenization, ranking (count desc, left, right), `scan_cap`
    prefix, compatibility selection, and in-rank-order batch application.
    Returns (merge table rows, n_rounds). Backs the golden-VALUES oracle."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    if scan_cap is None:
        scan_cap = 4 * batch_cap
    texts = pq.read_table(parquet_path, columns=[text_col])[text_col].to_pylist()
    wcounts: Counter = Counter()
    for t in texts:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                wcounts[w] += 1
    words: dict[tuple[str, ...], int] = {
        tuple(list(w) + [EOW]): c for w, c in wcounts.items()
    }
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        stats: Counter = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        ranked = [
            (l, r, int(c))
            for (l, r), c in sorted(
                stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )[:scan_cap]
        ]
        selected = _select_compatible(ranked, min(batch_cap, n_merges - len(merges)))
        if not selected:
            break
        rounds += 1
        for left, right, cnt in selected:
            merges.append((len(merges) + 1, left, right, cnt))
            new_words: dict[tuple[str, ...], int] = {}
            for syms, c in words.items():
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                key = tuple(out)
                new_words[key] = new_words.get(key, 0) + c
            words = new_words
    return merges, rounds


def bpe_reference_batched_encode_stats(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 256,
    batch_cap: int = 32,
) -> tuple[int, int, int]:
    """Single-process reference: replay the batched training spec, then
    reduce the final folded word-type dict to (n_words, n_base_symbols,
    n_encoded_symbols). Backs the golden-VALUES oracle of
    ``llm_bpe_encode_stats_batched``."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(parquet_path, columns=[text_col])[text_col].to_pylist()
    wcounts: Counter = Counter()
    for t in texts:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                wcounts[w] += 1
    n_words = sum(wcounts.values())
    n_base = sum((len(w) + 1) * c for w, c in wcounts.items())
    merges, _rounds = bpe_reference_python_batched(
        parquet_path, text_col=text_col, n_merges=n_merges, batch_cap=batch_cap
    )
    words: dict[tuple[str, ...], int] = {
        tuple(list(w) + [EOW]): c for w, c in wcounts.items()
    }
    for _, left, right, _cnt in merges:
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    n_encoded = sum(len(syms) * c for syms, c in words.items())
    return n_words, n_base, n_encoded


def bpe_encode_expr(merges: list[tuple[str, str]], symbols_col: str = "symbols") -> str:
    """SQL applying a learned merge list in rank order to a symbol-array
    column — one chained fold per merge (merge lists are hyperparameter-
    sized, so expression depth is bounded). The encode path for scoring a
    corpus with a trained tokenizer."""
    sql = symbols_col
    for left, right in merges:
        merged = _q(left + right)
        sql = (
            f"aggregate({sql}, cast(array() as array<string>), (acc, x) -> "
            f"if(size(acc) > 0 AND element_at(acc, -1) = {_q(left)} AND x = {_q(right)}, "
            f"concat(slice(acc, 1, size(acc) - 1), array({merged})), "
            "concat(acc, array(x))))"
        )
    return sql


def bpe_reference_python(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 8,
) -> list[tuple[int, str, str, int]]:
    """Single-process reference BPE trainer over the same parquet —
    tokenization mirrors `word_tokens` (lowercase, collapse ASCII
    whitespace, split; Java's \\s is ASCII-only, hence the explicit class),
    pair counting mirrors the zip explode (overlaps counted), the argmax
    tie-break is (count desc, left, right), and the substitution is the
    same left-to-right greedy. Backs the golden-VALUES oracle."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(parquet_path, columns=[text_col])[text_col].to_pylist()
    wcounts: Counter = Counter()
    for t in texts:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                wcounts[w] += 1
    words: dict[tuple[str, ...], int] = {
        tuple(list(w) + [EOW]): c for w, c in wcounts.items()
    }
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, left, right, int(cnt)))
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    return merges


def fertility_by_lang(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer fertility for ONE (global) merge table: how
    many subword symbols the tokenizer spends per word in each language —
    the standard multilingual-fairness audit (a tokenizer trained on a
    language mix systematically over-segments under-represented
    languages, inflating their effective sequence length and training
    cost).

    Returns (lang, n_words, n_base_symbols, n_encoded_symbols, fertility)
    with fertility = n_encoded_symbols / n_words as the one IEEE division
    at the edge (exact-integer numerator/denominator, so both engines
    round identically).

    Plan shape: one corpus scan reduces to the per-(lang, word)-type
    table; the merge fold (JVM expression, hyperparameter-bounded depth)
    and the weighted sums run over vocabulary-sized data per language.
    """
    words = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(word_tokens(F.col(text_col))).alias("word"),
        )
        .filter(F.length("word") > 0)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    chars = F.expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), "
        f"array('{EOW}'))"
    )
    typed = words.select(
        "lang", chars.alias("symbols"), F.size(chars).alias("base_len"), "wcount"
    )
    encoded = typed.withColumn("enc", F.expr(bpe_encode_expr(merges)))
    agg = encoded.groupBy("lang").agg(
        F.sum("wcount").cast("long").alias("n_words"),
        F.sum(F.col("base_len") * F.col("wcount")).cast("long").alias("n_base_symbols"),
        F.sum(F.size("enc") * F.col("wcount")).cast("long").alias("n_encoded_symbols"),
    )
    return agg.select(
        "lang",
        "n_words",
        "n_base_symbols",
        "n_encoded_symbols",
        (
            F.col("n_encoded_symbols").cast("double")
            / F.col("n_words").cast("double")
        ).alias("fertility"),
    )


def bpe_reference_fertility_by_lang(
    parquet_path: str,
    text_col: str = "text",
    lang_col: str = "lang",
    n_merges: int = 8,
) -> list[tuple[str, int, int, int, float]]:
    """Single-process reference for :func:`fertility_by_lang`: global
    training (same loop as :func:`bpe_reference_python`), per-language
    encode + weighted stats. Backs the golden-VALUES oracle."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[text_col, lang_col])
    texts = tbl[text_col].to_pylist()
    langs = tbl[lang_col].to_pylist()

    merges = [
        (left, right)
        for _, left, right, _ in bpe_reference_python(
            parquet_path, text_col=text_col, n_merges=n_merges
        )
    ]

    per_lang: dict[str, Counter] = {}
    for t, lang in zip(texts, langs):
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        c = per_lang.setdefault(lang, Counter())
        for w in norm.split(" "):
            if w:
                c[w] += 1

    out: list[tuple[str, int, int, int, float]] = []
    for lang in sorted(per_lang):
        wc = per_lang[lang]
        n_words = sum(wc.values())
        n_base = sum((len(w) + 1) * c for w, c in wc.items())
        n_enc = 0
        for w, c in wc.items():
            syms = list(w) + [EOW]
            for left, right in merges:
                folded: list[str] = []
                for x in syms:
                    if folded and folded[-1] == left and x == right:
                        folded[-1] = left + right
                    else:
                        folded.append(x)
                syms = folded
            n_enc += len(syms) * c
        out.append((lang, n_words, n_base, n_enc, n_enc / n_words))
    return out


def bpe_reference_encode_stats(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[int, int, int]:
    """Single-process reference for :func:`bpe_encode_stats`: same
    tokenization, same training loop, then (n_words, n_base_symbols,
    n_encoded_symbols) from the final folded word-type dict. Backs the
    golden-VALUES oracle."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(parquet_path, columns=[text_col])[text_col].to_pylist()
    wcounts: Counter = Counter()
    for t in texts:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                wcounts[w] += 1
    words: dict[tuple[str, ...], int] = {
        tuple(list(w) + [EOW]): c for w, c in wcounts.items()
    }
    n_words = sum(wcounts.values())
    n_base = sum((len(w) + 1) * c for w, c in wcounts.items())
    for _ in range(n_merges):
        stats: Counter = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        (left, right), _cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    n_encoded = sum(len(syms) * c for syms, c in words.items())
    return n_words, n_base, n_encoded
