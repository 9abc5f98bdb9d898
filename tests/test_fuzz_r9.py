"""Hypothesis fuzz for the round-9 operators: winnowing vs the brute
pure-Python reference on random text, Luhn vs a reference checksum on
random digit runs, and chunk coverage on random token counts."""

from __future__ import annotations

import hashlib
import os
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from aci_export_spark.llm import text as T
from aci_export_spark.llm import winnow as W

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# small alphabet forces hash ties and repeated grams; spaces exercise
# normalization
texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=60), min_size=1, max_size=4
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _winnow_py(text: str, k: int, w: int) -> set:
    s = _norm(text)
    hs = [
        (int(hashlib.md5(("win:" + s[i : i + k]).encode()).hexdigest()[:8], 16), i)
        for i in range(len(s) - k + 1)
    ]
    out = set()
    for start in range(len(hs) - w + 1):
        win = hs[start : start + w]
        mh = min(h for h, _ in win)
        out.add((max(p for h, p in win if h == mh), mh))
    return out


class TestWinnowFuzz:
    @given(ts=texts)
    @settings(**SETTINGS)
    def test_matches_reference(self, spark, ts):
        rows = [(i, t) for i, t in enumerate(ts)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got: dict[int, set] = {}
        for r in W.winnow_fingerprints(df, "doc_id", "text", k=4, w=3).collect():
            got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
        for i, t in enumerate(ts):
            assert got.get(i, set()) == _winnow_py(t, 4, 3), f"doc {i}: {t!r}"


def _luhn_py(c: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(c)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


class TestLuhnFuzz:
    @given(
        runs=st.lists(
            st.text(alphabet="0123456789", min_size=13, max_size=19),
            min_size=1,
            max_size=3,
        )
    )
    @settings(**SETTINGS)
    def test_matches_reference(self, spark, runs):
        text = " x ".join(runs)
        df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        r = T.luhn_card_stats(df, "doc_id", "text").collect()[0]
        assert r["n_candidates"] == len(runs)
        assert r["n_luhn_valid"] == sum(_luhn_py(c) for c in runs)


class TestChunkFuzz:
    @given(n=st.integers(min_value=1, max_value=300))
    @settings(**SETTINGS)
    def test_every_token_covered_once_per_window(self, spark, n):
        words = [f"w{i}" for i in range(n)]
        df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
        rows = sorted(
            T.chunk_passages(df, "doc_id", "text", 64, 48).collect(),
            key=lambda r: r["start_tok"],
        )
        # starts are exactly 1, 49, 97, ... <= n
        assert [r["start_tok"] for r in rows] == list(range(1, n + 1, 48))
        # coverage: union of [start, start+len-1] is [1, n] without gaps
        covered_to = 0
        for r in rows:
            assert r["start_tok"] <= covered_to + 1
            covered_to = max(covered_to, r["start_tok"] + r["n_chunk_tokens"] - 1)
        assert covered_to == n
