"""Multi-pattern blocklist matching via a real Aho-Corasick automaton.

The production shape for content filtering at corpus scale (unsafe-term
blocklists, PII trigger phrases, license boilerplate): thousands of literal
patterns matched in ONE pass over each document, instead of one scan per
pattern. Semantics are the standard AC ones — EVERY occurrence is reported,
including overlapping occurrences (``"a a"`` occurs twice in ``"a a a"``)
and occurrences surfaced through dictionary-suffix links (a match of
``"agg"`` also ends a match of ``"gg"``), which per-pattern
``replace()``-style counters get wrong.

Reference analogue: term-filter export predicates (SURVEY.md §2 curation
filters); the automaton construction follows Aho & Corasick (CACM 1975).

100 TB shape: the automaton is PATTERN-bounded (#states <= total pattern
bytes + 1), built once driver-side behind a loud cap and shipped to
executors inside the task closure; the scan is a single sequential pass
over each partition's document bytes (Arrow-batched ``mapInPandas``, no
shuffle, no join) emitting only (doc, pattern, count) hits. Corpus cost is
strictly linear in bytes regardless of pattern count.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Loud cap on automaton size (states == total pattern bytes + 1). The
#: automaton lives in every task closure as a states x 256 int32 table, so
#: an unexpectedly huge blocklist must fail NAMED, not OOM the executors
#: (the PMI/POS_SPACE discipline).
MAX_AC_STATES = 1_000_000


def build_aho_corasick(
    patterns: list[str],
) -> tuple[np.ndarray, dict[int, tuple[int, ...]]]:
    """Build the byte-level AC automaton: a full (states x 256) int32 DFA
    (goto + failure transitions precomposed, so the scan never follows
    fail chains) and the per-state output sets with dictionary-suffix
    outputs merged in BFS order.

    Raises ValueError on an empty/duplicate pattern or when the state
    count would exceed :data:`MAX_AC_STATES`.
    """
    if not patterns:
        raise ValueError("aho-corasick: empty pattern list")
    if len(set(patterns)) != len(patterns):
        raise ValueError("aho-corasick: duplicate patterns")
    total_bytes = sum(len(p.encode("utf-8")) for p in patterns)
    if any(not p for p in patterns):
        raise ValueError("aho-corasick: empty pattern")
    if total_bytes + 1 > MAX_AC_STATES:
        raise ValueError(
            f"aho-corasick: {total_bytes + 1} states exceeds the "
            f"MAX_AC_STATES={MAX_AC_STATES} closure-size cap; shard the "
            "blocklist or raise the cap deliberately"
        )
    goto: list[dict[int, int]] = [{}]
    raw_out: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        s = 0
        for ch in pat.encode("utf-8"):
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                raw_out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        raw_out[s].append(pid)
    n = len(goto)
    dfa = np.zeros((n, 256), dtype=np.int32)
    fail = [0] * n
    q: deque[int] = deque()
    for ch, nxt in goto[0].items():
        dfa[0, ch] = nxt
        q.append(nxt)
    while q:
        s = q.popleft()
        # fail[s] is strictly shallower, so its outputs are already merged
        raw_out[s].extend(raw_out[fail[s]])
        for ch in range(256):
            nxt = goto[s].get(ch)
            if nxt is not None:
                fail[nxt] = int(dfa[fail[s], ch])
                q.append(nxt)
                dfa[s, ch] = nxt
            else:
                dfa[s, ch] = dfa[fail[s], ch]
    outputs = {s: tuple(o) for s, o in enumerate(raw_out) if o}
    return dfa, outputs


def blocklist_matches(
    docs: DataFrame, patterns: list[str], id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pattern, n_occurrences) rows, one per (document, pattern) with
    at least one occurrence; every occurrence counted, overlapping and
    suffix-linked included. One automaton pass per document byte."""
    dfa, outputs = build_aho_corasick(patterns)
    pattern_arr = list(patterns)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = dfa  # closure capture; ~states*1KB, pattern-bounded
        outs = outputs
        for pdf in batches:
            ids: list[int] = []
            pats: list[str] = []
            ns: list[int] = []
            for d, text in zip(pdf[id_col], pdf[text_col]):
                counts: dict[int, int] = {}
                s = 0
                for b in text.encode("utf-8"):
                    s = int(table[s, b])
                    hit = outs.get(s)
                    if hit is not None:
                        for pid in hit:
                            counts[pid] = counts.get(pid, 0) + 1
                for pid in sorted(counts):
                    ids.append(int(d))
                    pats.append(pattern_arr[pid])
                    ns.append(counts[pid])
            yield pd.DataFrame(
                {id_col: ids, "pattern": pats, "n_occurrences": ns}
            )

    src = docs.select(id_col, text_col)
    return src.mapInPandas(
        scan,
        schema=f"{id_col} long, pattern string, n_occurrences long",
    ).withColumn("n_occurrences", F.col("n_occurrences").cast("long"))
