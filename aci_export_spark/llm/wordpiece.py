"""WordPiece tokenizer training as distributed aggregations — the
likelihood-scored sibling of BPE, completing the tokenizer-training matrix
(llm/bpe.py: frequency-scored merges; llm/unigram.py: EM-pruned vocabulary;
here: frequency/(freq_left*freq_right)-scored merges, the BERT tokenizer's
trainer as shipped by HuggingFace `tokenizers`).

Differences from BPE, all load-bearing:

- symbols carry the word-internal continuation prefix ``##`` (word-initial
  char bare, every later char prefixed), and a merge CONCATENATES MODULO
  THE PREFIX: ("a", "##b") -> "ab", ("##a", "##b") -> "##ab";
- the merge objective is the pair's corpus likelihood gain, ranked by
  score = pair_count / (freq(left) * freq(right)) — pairs of rare symbols
  win over raw-frequency pairs, which is what makes WordPiece vocabularies
  favor meaningful affixes;
- ties break on (left, right) lexicographic, like the BPE trainer.

Exactness: the score ranking is decided on DOUBLES — but both engines build
them identically (BIGINT pair count, DECIMAL(38,0) frequency product checked
against the int64 range with an explicit raise — the pmi_collocations
overflow discipline — then ONE IEEE division), so the golden-VALUES oracle
from the single-process reference is exact, not approximate.

Scale design is the llm/bpe.py batched discipline verbatim: the corpus
reduces ONCE to the word-type table (the only corpus-scale shuffle); each
round computes pair counts AND symbol frequencies with map-side-combined
aggregations over word types, collects a `scan_cap` ranked prefix, selects
up to `batch_cap` mutually non-interacting merges (`_select_compatible` —
disjoint merges change neither each other's pair counts NOR each other's
symbol frequencies, so every selected score is provably still exact when it
applies), and applies the batch as one data-driven JVM fold. Driver round
trips are O(n_merges / batch-yield).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

from aci_export_spark.llm.bpe import (
    _apply_merge_local,
    _collect_word_entries,
    _local_train_types_bound,
    _pair_counts,
    _words_df_from_entries,
)
from aci_export_spark.llm.dedup import word_tokens

#: continuation prefix, per the WordPiece/BERT convention
CONT = "##"


def _wp_local_ranked(
    entries: list[list], scan_cap: int
) -> list[tuple[str, str, int, int, int]]:
    """Local mirror of the ``_scored_pairs → orderBy → limit`` round step:
    pair/symbol counting over the collected word-type entries, the SAME
    int64 overflow guard on the frequency product, and the SAME
    (score desc, left, right) ranking on the identically-constructed
    double."""
    from collections import Counter

    pair_stats: Counter = Counter()
    sym_stats: Counter = Counter()
    for syms, wc, _bl in entries:
        for s in syms:
            sym_stats[s] += wc
        for a, b in zip(syms, syms[1:]):
            pair_stats[(a, b)] += wc
    scored = []
    for (l, r), c in pair_stats.items():
        fl, fr = int(sym_stats[l]), int(sym_stats[r])
        if fl * fr > 2**63 - 1:
            raise ValueError(
                "wordpiece: freq(left)*freq(right) overflows BIGINT — "
                "rescale scores (e.g. rank by count/freq_l/freq_r in log "
                "space) at this corpus size"
            )
        scored.append((l, r, int(c), fl, fr, float(c) / float(fl * fr)))
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    return [(l, r, c, fl, fr) for l, r, c, fl, fr, _ in scored[:scan_cap]]


def _wp_concat(left: str, right: str) -> str:
    """Merge product: right side drops its continuation prefix."""
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _wp_select_compatible(
    ranked: list[tuple[str, str, int, int, int]],
    room: int,
) -> list[tuple[str, str, int, int, int]]:
    """Greedy prefix selection of mutually non-interacting pairs — the BPE
    `_select_compatible` rule with the WordPiece merge product: a later
    pair is safe iff its symbols are disjoint from every earlier selected
    pair's symbols AND products (so both its pair count and its two symbol
    frequencies are unchanged by the earlier merges of the batch)."""
    used: set[str] = set()
    produced: set[str] = set()
    selected: list[tuple[str, str, int, int, int]] = []
    for left, right, cnt, fl, fr in ranked:
        if len(selected) >= room:
            break
        if left in used or right in used or left in produced or right in produced:
            continue
        selected.append((left, right, cnt, fl, fr))
        used.update((left, right))
        produced.add(_wp_concat(left, right))
    return selected


def _wp_word_types(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, wcount): word-initial char bare, continuation
    chars ``##``-prefixed — the WordPiece alphabet."""
    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> "
        f"if(i = 1, substring(word, i, 1), concat('{CONT}', substring(word, i, 1))))"
    )
    return words.select(chars.alias("symbols"), "wcount")


def _symbol_freqs(words: DataFrame) -> DataFrame:
    """(sym, freq): total corpus occurrences of each CURRENT symbol,
    weighted by word frequency — the denominators of the WordPiece score.
    Map-side combined; vocabulary-sized output."""
    return (
        words.select(F.explode("symbols").alias("sym"), "wcount")
        .groupBy("sym")
        .agg(F.sum("wcount").alias("freq"))
    )


def _scored_pairs(words: DataFrame) -> DataFrame:
    """Pair counts joined with both symbols' frequencies, scored by
    count/(freq_l*freq_r) as ONE IEEE division over an overflow-checked
    exact product (decimal(38,0) guard: wrapping int64 would silently
    re-rank; the oracle raises, so must we)."""
    freqs = _symbol_freqs(words)
    prod = F.col("freq_l").cast("decimal(38,0)") * F.col("freq_r").cast(
        "decimal(38,0)"
    )
    checked = F.when(
        prod > F.lit(2**63 - 1).cast("decimal(38,0)"),
        F.raise_error(
            F.lit("wordpiece: freq(left)*freq(right) overflows BIGINT — "
                  "rescale scores (e.g. rank by count/freq_l/freq_r in log "
                  "space) at this corpus size")
        ).cast("decimal(38,0)"),
    ).otherwise(prod).cast("long")
    return (
        _pair_counts(words)
        .join(
            freqs.select(F.col("sym").alias("left"), F.col("freq").alias("freq_l")),
            on="left",
        )
        .join(
            freqs.select(F.col("sym").alias("right"), F.col("freq").alias("freq_r")),
            on="right",
        )
        .select(
            "left",
            "right",
            "pair_count",
            "freq_l",
            "freq_r",
            (
                F.col("pair_count").cast("double") / checked.cast("double")
            ).alias("score"),
        )
    )


def wordpiece_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 48,
    batch_cap: int = 16,
    scan_cap: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Train `n_merges` WordPiece merges; returns (merge table, final
    encoded word-type table, n_rounds). The merge table carries the exact
    integer evidence beside the ranking double: (merge_rank, left_sym,
    right_sym, new_sym, pair_count, freq_left, freq_right, score)."""
    spark = docs.sparkSession
    if scan_cap is None:
        scan_cap = 4 * batch_cap
    words = (
        _wp_word_types(docs, text_col)
        .withColumn("base_len", F.size("symbols"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int, int, int, float]] = []
    rounds = 0
    entries = _collect_word_entries(words, _local_train_types_bound())
    while len(merges) < n_merges:
        if entries is not None:
            # size-conditioned local fast path (llm/bpe.py discipline):
            # identical counting, the identical overflow guard, and the
            # identical (score desc, left, right) double ranking — zero
            # per-round jobs. Equivalence randomized-tested in
            # tests/test_bpe_local_fast_path.py.
            ranked = _wp_local_ranked(entries, scan_cap)
        else:
            ranked_rows = (
                _scored_pairs(words)
                .orderBy(F.col("score").desc(), F.col("left"), F.col("right"))
                .limit(scan_cap)
                .collect()
            )
            ranked = [
                (r["left"], r["right"], int(r["pair_count"]),
                 int(r["freq_l"]), int(r["freq_r"]))
                for r in ranked_rows
            ]
        if not ranked:
            break
        selected = _wp_select_compatible(
            ranked, min(batch_cap, n_merges - len(merges))
        )
        if not selected:
            break
        rounds += 1
        for left, right, cnt, fl, fr in selected:
            merges.append(
                (len(merges) + 1, left, right, _wp_concat(left, right),
                 cnt, fl, fr, float(cnt) / float(fl * fr))
            )
        if entries is not None:
            for left, right, _cnt, _fl, _fr in selected:
                _apply_merge_local(
                    entries, left, right, _wp_concat(left, right)
                )
        else:
            fold = _wp_batch_fold_sql([(l, r) for l, r, _, _, _ in selected])
            words = words.withColumn("symbols", F.expr(fold)).localCheckpoint(
                eager=True
            )
    if entries is not None:
        words = _words_df_from_entries(spark, entries)
    merge_df = local_rows_df(
        spark,
        merges,
        schema="merge_rank int, left_sym string, right_sym string, "
        "new_sym string, pair_count bigint, freq_left bigint, "
        "freq_right bigint, score double",
    )
    return merge_df, words, rounds


def _wp_batch_fold_sql(selected: list[tuple[str, str]]) -> str:
    """llm/bpe.py's `_batch_fold_sql` with the WordPiece merge product (##
    stripped from the right side): one JVM expression applying the whole
    batch in rank order — outer fold over a literal merge array, inner
    left-to-right greedy substitution."""
    from aci_export_spark.llm.bpe import _q

    arr = "array(" + ", ".join(
        f"named_struct('l', {_q(l)}, 'r', {_q(r)}, 'm', {_q(_wp_concat(l, r))})"
        for l, r in selected
    ) + ")"
    return (
        f"aggregate({arr}, symbols, (syms, mg) -> "
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        "if(size(acc) > 0 AND element_at(acc, -1) = mg.l AND x = mg.r, "
        "concat(slice(acc, 1, size(acc) - 1), array(mg.m)), "
        "concat(acc, array(x)))))"
    )


def wordpiece_reference_python(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 48,
    batch_cap: int = 16,
    scan_cap: int | None = None,
) -> tuple[list[tuple[int, str, str, str, int, int, int, float]], int]:
    """Single-process reference trainer: identical tokenization (lowercase,
    ASCII-whitespace split — `word_tokens`), ## alphabet, pair/frequency
    counting, double-division scoring, (score desc, left, right) ranking,
    `scan_cap` prefix, compatibility selection, and in-rank-order batch
    application. Backs the golden-VALUES oracle of `llm_wordpiece_train`."""
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
        tuple(
            c if i == 0 else CONT + c for i, c in enumerate(w)
        ): n
        for w, n in wcounts.items()
    }
    merges: list[tuple[int, str, str, str, int, int, int, float]] = []
    rounds = 0
    while len(merges) < n_merges:
        pair_stats: Counter = Counter()
        sym_stats: Counter = Counter()
        for syms, c in words.items():
            for s in syms:
                sym_stats[s] += c
            for a, b in zip(syms, syms[1:]):
                pair_stats[(a, b)] += c
        if not pair_stats:
            break
        scored = [
            (l, r, int(c), int(sym_stats[l]), int(sym_stats[r]),
             float(c) / float(int(sym_stats[l]) * int(sym_stats[r])))
            for (l, r), c in pair_stats.items()
        ]
        scored.sort(key=lambda t: (-t[5], t[0], t[1]))
        ranked = [(l, r, c, fl, fr) for l, r, c, fl, fr, _ in scored[:scan_cap]]
        selected = _wp_select_compatible(
            ranked, min(batch_cap, n_merges - len(merges))
        )
        if not selected:
            break
        rounds += 1
        for left, right, cnt, fl, fr in selected:
            merges.append(
                (len(merges) + 1, left, right, _wp_concat(left, right),
                 cnt, fl, fr, float(cnt) / float(fl * fr))
            )
            merged = _wp_concat(left, right)
            new_words: dict[tuple[str, ...], int] = {}
            for syms, c in words.items():
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = merged
                    else:
                        out.append(x)
                key = tuple(out)
                new_words[key] = new_words.get(key, 0) + c
            words = new_words
    return merges, rounds
