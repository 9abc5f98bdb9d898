"""Aho-Corasick blocklist: differential vs a naive exhaustive counter,
the classic semantic hazards (overlap, dictionary-suffix links, prefix
containment), and the loud automaton-size cap."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark.llm.blocklist import (
    MAX_AC_STATES,
    build_aho_corasick,
)


def _ac_count(patterns: list[str], text: str) -> dict[str, int]:
    dfa, outputs = build_aho_corasick(patterns)
    counts: dict[int, int] = {}
    s = 0
    for b in text.encode("utf-8"):
        s = int(dfa[s, b])
        hit = outputs.get(s)
        if hit is not None:
            for pid in hit:
                counts[pid] = counts.get(pid, 0) + 1
    return {patterns[pid]: n for pid, n in counts.items()}


def _naive_count(patterns: list[str], text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for p in patterns:
        n = sum(
            1
            for i in range(len(text) - len(p) + 1)
            if text[i : i + len(p)] == p
        )
        if n:
            out[p] = n
    return out


def test_overlapping_occurrences() -> None:
    assert _ac_count(["a a"], "a a a") == {"a a": 2}


def test_dictionary_suffix_link() -> None:
    # "gg" ends inside every "agg" match; a broken output merge drops it
    assert _ac_count(["agg", "gg"], "xaggy agg") == {"agg": 2, "gg": 2}


def test_prefix_containment() -> None:
    assert _ac_count(["table", "table table"], "table table table") == {
        "table": 3,
        "table table": 2,  # overlapping
    }


def test_pattern_is_suffix_of_another_and_standalone() -> None:
    assert _ac_count(["agg", "gg"], "gg agg gga") == {"agg": 1, "gg": 3}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abr ", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    st.text(alphabet="abr ", max_size=60),
)
def test_differential_vs_naive(patterns: list[str], text: str) -> None:
    assert _ac_count(patterns, text) == _naive_count(patterns, text)


def test_empty_pattern_rejected() -> None:
    with pytest.raises(ValueError, match="empty pattern"):
        build_aho_corasick(["ok", ""])


def test_duplicate_patterns_rejected() -> None:
    with pytest.raises(ValueError, match="duplicate"):
        build_aho_corasick(["x", "x"])


def test_state_cap_trips_loudly() -> None:
    # one pattern longer than the cap -> named error, not an executor OOM
    big = "a" * MAX_AC_STATES
    with pytest.raises(ValueError, match="MAX_AC_STATES"):
        build_aho_corasick([big])


def test_multibyte_utf8_patterns() -> None:
    # byte-level automaton must count multi-byte characters correctly
    assert _ac_count(["é", "éé"], "ééé x é") == {"é": 4, "éé": 2}
