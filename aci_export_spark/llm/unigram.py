"""Unigram-LM (SentencePiece-style) tokenizer training — the EM sibling of
the BPE trainer (`llm/bpe.py`), completing the tokenizer matrix.

Algorithm (Kudo 2018, "Subword Regularization", hard-EM/Viterbi variant —
deterministic by construction so an independent single-process reference
reproduces it bit-for-bit):

1. **Seed**: the corpus is reduced ONCE to the word-type table
   (word, wcount) — the only corpus-scale shuffle, exactly the BPE
   discipline — and the seed vocabulary is every substring of length
   1..max_piece_len of every word type, counted with word frequency
   weights (overlapping occurrences counted). All single characters are
   kept unconditionally (coverage guarantee); the top ``seed_multi``
   multi-char pieces by (count desc, piece asc) join them.
2. **E-step** (distributed): each word type is segmented by exact Viterbi
   under the current piece scores — the segmentation maximizing
   ``prod_i score(p_i) / T^n`` with Laplace smoothing
   (``score = count + 1``, ``T = sum(counts) + |V|``), compared as EXACT
   big-integer cross-products (never floats — IEEE log-sums round
   differently across engines and could flip an argmax). Piece usage is
   summed with word-frequency weights: Python big-int DP runs inside
   ``mapInPandas`` (Arrow-batched, per-partition Counter pre-aggregation),
   followed by one vocabulary-sized groupBy shuffle.
3. **M-step + prune** (driver-side, the batched-BPE round-loop
   discipline): next-round scores are this round's usage counts; while the
   multi-char vocabulary exceeds the target, the bottom quarter by
   (usage desc, piece asc) rank is dropped (never below the target, never
   a single char). Rounds are bounded by ``log_{4/3}(seed/target)`` —
   hyperparameters, not data.

Determinism contract: integer counts, exact rational comparisons,
lexicographic tie-breaks (prob desc, then fewer pieces, then smallest
split start = longest trailing piece), so :func:`unigram_reference_python`
backs a golden-VALUES oracle exactly like ``bpe_reference_python``.

Scale design (100 TB):
- corpus → word types: one linear shuffle; everything after is
  vocabulary-sized (word types, not tokens).
- the piece-score table shipped to the E-step is bounded by the
  ``seed_multi`` + alphabet hyperparameters (a few thousand entries), NOT
  by the corpus — closure-capturing it is the bounded-broadcast case, the
  opposite of the unguarded corpus-side broadcast r9 flagged.
- per round: one Arrow-batched map pass over word types with Python-side
  partial aggregation, one vocab-sized shuffle, one vocab-sized collect
  (the 1-row-argmax discipline of `bpe.py`, widened to |V| rows — still
  hyperparameter-bounded).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

from aci_export_spark.llm.bpe import _local_train_types_bound
from aci_export_spark.llm.dedup import word_tokens


def word_type_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): one row per distinct word — the single corpus-scale
    reduction every tokenizer pass here fans out from."""
    return (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def substring_counts(words: DataFrame, max_piece_len: int = 4) -> DataFrame:
    """(piece, scount): every substring of length 1..max_piece_len of every
    word type, weighted by word frequency, overlapping occurrences counted.
    One explode (≤ len·max_piece_len rows per word type) + one map-side
    combined groupBy — vocabulary-sized, never corpus-sized."""
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("word") - i + 1),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    return (
        words.select(F.explode(pieces).alias("piece"), "wcount")
        .groupBy("piece")
        .agg(F.sum("wcount").cast("long").alias("scount"))
    )


def _seed_vocab_local(
    entries: list[tuple[str, int]], max_piece_len: int, seed_multi: int
) -> dict[str, int]:
    """Local mirror of :func:`seed_vocab` over collected (word, wcount)
    entries: identical substring universe (length 1..max_piece_len,
    overlapping occurrences counted, wcount-weighted), identical
    (scount desc, piece asc) multi-char ranking."""
    from collections import Counter

    counts: Counter = Counter()
    for word, wc in entries:
        L = len(word)
        for i in range(L):
            for ln in range(1, min(max_piece_len, L - i) + 1):
                counts[word[i : i + ln]] += wc
    out = {p: int(c) for p, c in counts.items() if len(p) == 1}
    multis = sorted(
        ((p, int(c)) for p, c in counts.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:seed_multi]
    out.update(multis)
    return out


def _estep_usage_local(
    entries: list[tuple[str, int]], scores: dict[str, int], max_piece_len: int
) -> dict[str, int]:
    """Local mirror of :func:`estep_usage`.collect(): the SAME
    :func:`viterbi_segment` over every word type, wcount-weighted piece
    usage sums."""
    from collections import Counter

    total = sum(scores.values()) + len(scores)
    acc: Counter = Counter()
    for word, wc in entries:
        for piece in viterbi_segment(word, scores, total, max_piece_len):
            acc[piece] += wc
    return dict(acc)


def seed_vocab(
    words: DataFrame, max_piece_len: int = 4, seed_multi: int = 48
) -> dict[str, int]:
    """Initial piece scores: ALL single chars (coverage) + the top
    ``seed_multi`` multi-char substrings by (count desc, piece asc). The
    collect is bounded by |alphabet| + seed_multi — hyperparameters."""
    counts = substring_counts(words, max_piece_len)
    chars = counts.filter(F.length("piece") == 1).collect()
    multis = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.col("scount").desc(), F.col("piece").asc())
        .limit(seed_multi)
        .collect()
    )
    return {r["piece"]: int(r["scount"]) for r in [*chars, *multis]}


def _better(
    cand_p: int, cand_n: int, cand_j: int, inc_p: int, inc_n: int, inc_j: int,
    total: int,
) -> bool:
    """Exact comparison of two lattice states at the same position:
    cand wins on higher normalized probability (big-int cross-product of
    ``P/T^n``), then on fewer pieces, then on smaller split start (longest
    trailing piece). No floats anywhere."""
    lhs = cand_p * total**inc_n
    rhs = inc_p * total**cand_n
    if lhs != rhs:
        return lhs > rhs
    if cand_n != inc_n:
        return cand_n < inc_n
    return cand_j < inc_j


def viterbi_segment(
    word: str, scores: dict[str, int], total: int, max_piece_len: int
) -> list[str]:
    """Exact-Viterbi segmentation of one word under Laplace-smoothed piece
    scores (``p(piece) = (count+1)/T``): DP over prefix positions, each
    state carrying the exact integer numerator ``prod (count_i + 1)`` and
    the piece count n, compared via :func:`_better`. A position no piece
    reaches is bridged by its single character at count 0 (Laplace keeps
    it usable), so every word segments."""
    L = len(word)
    # best[i] = (P numerator, n pieces, backpointer j) for prefix word[:i]
    best: list[tuple[int, int, int] | None] = [None] * (L + 1)
    best[0] = (1, 0, 0)
    for i in range(1, L + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            c = scores.get(piece)
            if c is None and len(piece) > 1:
                continue
            pj, nj, _ = best[j]
            cand = (pj * ((c or 0) + 1), nj + 1, j)
            if best[i] is None or _better(*cand, *best[i], total):
                best[i] = cand
    out: list[str] = []
    i = L
    while i > 0:
        j = best[i][2]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def estep_usage(
    words: DataFrame, scores: dict[str, int], max_piece_len: int
) -> DataFrame:
    """(piece, usage): Viterbi-segment every word type under `scores` and
    sum piece usage with word-frequency weights. Python big-int DP inside
    mapInPandas (Arrow batches, per-partition Counter pre-aggregation),
    then ONE vocabulary-sized shuffle. The captured `scores` dict is
    hyperparameter-bounded (seed_multi + alphabet), never corpus-sized."""
    total = sum(scores.values()) + len(scores)
    frozen = dict(scores)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        acc: Counter = Counter()
        for pdf in batches:
            for word, wc in zip(pdf["word"], pdf["wcount"]):
                for piece in viterbi_segment(word, frozen, total, max_piece_len):
                    acc[piece] += int(wc)
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "usage": list(acc.values())}
            )
        else:  # empty partition still needs a typed frame for Arrow
            yield pd.DataFrame(
                {
                    "piece": pd.Series([], dtype=str),
                    "usage": pd.Series([], dtype="int64"),
                }
            )

    return (
        words.mapInPandas(gen, schema="piece string, usage long")
        .groupBy("piece")
        .agg(F.sum("usage").cast("long").alias("usage"))
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 40,
    max_piece_len: int = 4,
    seed_multi: int = 48,
) -> DataFrame:
    """Train the unigram-LM vocabulary; returns the model table
    (piece, usage_count, is_char, rank) — tiny by construction (vocab_size
    is a hyperparameter), ranked by (usage desc, piece asc).

    `vocab_size` counts MULTI-CHAR pieces only; single chars ride along
    unconditionally (SentencePiece's required-character set). Prune drops
    the bottom quarter of multi-char pieces per round (never below the
    target); the final E-step's usage counts are the emitted scores."""
    spark = docs.sparkSession
    words = word_type_table(docs, text_col).localCheckpoint(eager=True)

    # Size-conditioned local fast path (llm/bpe.py discipline): at a
    # vocabulary-bounded word-type count the seed count and every EM round
    # run on the driver over the collected (word, wcount) table — the SAME
    # substring counting, the SAME viterbi_segment function, zero per-round
    # jobs. Above the bound the distributed path below is untouched.
    # Equivalence randomized-tested in tests/test_bpe_local_fast_path.py.
    bound = _local_train_types_bound()
    entries: list[tuple[str, int]] | None = None
    if bound > 0:
        rows = words.limit(bound + 1).collect()
        if len(rows) <= bound:
            entries = [(r["word"], int(r["wcount"])) for r in rows]
    if entries is not None:
        scores = _seed_vocab_local(entries, max_piece_len, seed_multi)
    else:
        scores = seed_vocab(words, max_piece_len, seed_multi)

    def _multis(sc: dict[str, int]) -> list[str]:
        return [p for p in sc if len(p) >= 2]

    while True:
        if entries is not None:
            usage = _estep_usage_local(entries, scores, max_piece_len)
        else:
            usage_rows = estep_usage(words, scores, max_piece_len).collect()
            usage = {r["piece"]: int(r["usage"]) for r in usage_rows}
        # every vocab entry persists through the M-step (unused → 0): a
        # piece must stay addressable for Laplace and for the prune rank
        new_scores = {p: usage.get(p, 0) for p in scores}
        multis = _multis(new_scores)
        if len(multis) <= vocab_size:
            scores = new_scores
            break
        keep = max(vocab_size, (len(multis) * 3) // 4)
        kept = set(sorted(multis, key=lambda p: (-new_scores[p], p))[:keep])
        scores = {
            p: new_scores[p] for p in new_scores if len(p) == 1 or p in kept
        }

    rows = sorted(
        ((p, c, len(p) == 1) for p, c in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return local_rows_df(
        spark,
        [(p, c, ic, i + 1) for i, (p, c, ic) in enumerate(rows)],
        schema="piece string, usage_count bigint, is_char boolean, rank int",
    )


def unigram_fertility_by_lang(
    docs: DataFrame,
    scores: dict[str, int],
    text_col: str = "text",
    lang_col: str = "lang",
    max_piece_len: int = 4,
) -> DataFrame:
    """Per-language fertility of a trained unigram vocabulary — the same
    multilingual-fairness audit as `bpe.fertility_by_lang`, under Viterbi
    segmentation: (lang, n_words, n_chars, n_pieces, fertility) with
    fertility = n_pieces / n_words as the one IEEE division at the edge."""
    total = sum(scores.values()) + len(scores)
    frozen = dict(scores)

    words = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(word_tokens(F.col(text_col))).alias("word"),
        )
        .filter(F.length("word") > 0)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_pieces = [
                len(viterbi_segment(w, frozen, total, max_piece_len))
                for w in pdf["word"]
            ]
            out = pdf.assign(n_pieces=pd.Series(n_pieces, index=pdf.index))
            yield out[["lang", "word", "wcount", "n_pieces"]]

    seg = words.mapInPandas(
        gen, schema="lang string, word string, wcount bigint, n_pieces long"
    )
    agg = seg.groupBy("lang").agg(
        F.sum("wcount").cast("long").alias("n_words"),
        F.sum(F.length("word") * F.col("wcount")).cast("long").alias("n_chars"),
        F.sum(F.col("n_pieces") * F.col("wcount")).cast("long").alias("n_pieces"),
    )
    return agg.select(
        "lang",
        "n_words",
        "n_chars",
        "n_pieces",
        (
            F.col("n_pieces").cast("double") / F.col("n_words").cast("double")
        ).alias("fertility"),
    )


# --------------------------------------------------------------------------
# single-process reference (golden-VALUES oracle backing, the
# bpe_reference_python pattern): same semantics, independent machinery —
# pure-dict pipeline over pyarrow, no Spark, recursive-memo Viterbi.
# --------------------------------------------------------------------------


def _ref_word_types(parquet_path: str, text_col: str) -> dict[str, int]:
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    texts = pq.read_table(parquet_path, columns=[text_col])[text_col].to_pylist()
    wc: Counter = Counter()
    for t in texts:
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                wc[w] += 1
    return dict(wc)


def _ref_viterbi(
    word: str, scores: dict[str, int], total: int, max_piece_len: int
) -> list[str]:
    """Memoized top-down Viterbi — deliberately a different DP realization
    than the iterative executor-side one, agreeing by the shared
    comparison contract (:func:`_better`)."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def solve(i: int) -> tuple[int, int, int] | None:
        if i == 0:
            return (1, 0, 0)
        state: tuple[int, int, int] | None = None
        for j in range(max(0, i - max_piece_len), i):
            sub = solve(j)
            if sub is None:
                continue
            piece = word[j:i]
            c = scores.get(piece)
            if c is None and len(piece) > 1:
                continue
            cand = (sub[0] * ((c or 0) + 1), sub[1] + 1, j)
            if state is None or _better(*cand, *state, total):
                state = cand
        return state

    # warm the memo in index order so no solve() call recurses deeper than
    # max_piece_len — a bare top-down pass recurses len(word) frames and a
    # single ~1000-char whitespace-free token (URL, base64 blob) would blow
    # the interpreter recursion limit in the ORACLE builder while the
    # iterative executor-side DP sails through
    for k in range(1, len(word) + 1):
        solve(k)
    out: list[str] = []
    i = len(word)
    while i > 0:
        j = solve(i)[2]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _ref_train_scores(
    wtypes: dict[str, int],
    vocab_size: int,
    max_piece_len: int,
    seed_multi: int,
) -> dict[str, int]:
    from collections import Counter

    sub: Counter = Counter()
    for w, c in wtypes.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i : i + l]] += c
    scores = {p: c for p, c in sub.items() if len(p) == 1}
    multis = sorted(
        (p for p in sub if len(p) >= 2), key=lambda p: (-sub[p], p)
    )[:seed_multi]
    scores.update({p: sub[p] for p in multis})

    while True:
        total = sum(scores.values()) + len(scores)
        usage: Counter = Counter()
        for w, c in wtypes.items():
            for piece in _ref_viterbi(w, scores, total, max_piece_len):
                usage[piece] += c
        new_scores = {p: usage.get(p, 0) for p in scores}
        multis = [p for p in new_scores if len(p) >= 2]
        if len(multis) <= vocab_size:
            return new_scores
        keep = max(vocab_size, (len(multis) * 3) // 4)
        ranked = set(sorted(multis, key=lambda p: (-new_scores[p], p))[:keep])
        scores = {
            p: new_scores[p] for p in new_scores if len(p) == 1 or p in ranked
        }


def unigram_reference_python(
    parquet_path: str,
    text_col: str = "text",
    vocab_size: int = 40,
    max_piece_len: int = 4,
    seed_multi: int = 48,
) -> list[tuple[str, int, bool, int]]:
    """Single-process reference trainer over the same parquet: returns the
    (piece, usage_count, is_char, rank) rows the Spark trainer must
    reproduce exactly."""
    wtypes = _ref_word_types(parquet_path, text_col)
    scores = _ref_train_scores(wtypes, vocab_size, max_piece_len, seed_multi)
    rows = sorted(
        ((p, c, len(p) == 1) for p, c in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return [(p, c, ic, i + 1) for i, (p, c, ic) in enumerate(rows)]


def unigram_reference_fertility(
    parquet_path: str,
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_size: int = 40,
    max_piece_len: int = 4,
    seed_multi: int = 48,
) -> list[tuple[str, int, int, int]]:
    """Reference fertility rows (lang, n_words, n_chars, n_pieces) under
    the reference-trained vocabulary, sorted by lang."""
    import re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    wtypes = _ref_word_types(parquet_path, text_col)
    scores = _ref_train_scores(wtypes, vocab_size, max_piece_len, seed_multi)
    total = sum(scores.values()) + len(scores)

    tbl = pq.read_table(parquet_path, columns=[text_col, lang_col])
    texts = tbl[text_col].to_pylist()
    langs = tbl[lang_col].to_pylist()
    per_lang: dict[str, Counter] = defaultdict(Counter)
    for t, lg in zip(texts, langs):
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                per_lang[lg][w] += 1
    out = []
    for lg in sorted(per_lang):
        wc = per_lang[lg]
        n_words = sum(wc.values())
        n_chars = sum(len(w) * c for w, c in wc.items())
        n_pieces = sum(
            len(_ref_viterbi(w, scores, total, max_piece_len)) * c
            for w, c in wc.items()
        )
        out.append((lg, n_words, n_chars, n_pieces))
    return out
