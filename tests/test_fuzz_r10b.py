"""Hypothesis fuzz for the round-10 second-wave operators.

- FS-EM: on random pattern tables the fixed-point recursion is invariant
  to pattern order and count scaling (sufficient-statistic exactness),
  keeps every parameter on the 2^-40 grid strictly inside (0, 1), and the
  pattern-weighted posterior reproduces the mixture total.
- WordPiece reference trainer: on random tiny corpora every merge's
  recorded evidence is self-consistent (new_sym is the prefix-stripped
  concat, score is the division of its own integers), ranks are dense,
  and encoding with the merge table never increases symbol count.
- Gap-fill LOCF vs a brute single-process reference on random event sets:
  same grid, same fill values, same gap ages.
"""

from __future__ import annotations

import datetime as dt
import os
from fractions import Fraction

from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


_pattern_tables = st.lists(
    st.tuples(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        st.integers(1, 10_000),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


class TestFsEmFuzz:
    @given(patterns=_pattern_tables, perm_seed=st.integers(0, 1_000))
    @settings(**SETTINGS)
    def test_order_invariance_and_grid_contract(self, patterns, perm_seed):
        import random

        from aci_export_spark.operators.fuzzy import fs_em_fixed_point

        a = fs_em_fixed_point(patterns, 3, iters=8)
        shuffled = patterns[:]
        random.Random(perm_seed).shuffle(shuffled)
        b = fs_em_fixed_point(shuffled, 3, iters=8)
        assert a == b  # exact rationals: accumulation order cannot matter
        lam, m, u = a
        for p in (lam, *m, *u):
            assert 0 < p < 1
            assert (1 << 40) % Fraction(p).denominator == 0

    @given(patterns=_pattern_tables, scale=st.integers(2, 50))
    @settings(**SETTINGS)
    def test_count_scaling_invariance(self, patterns, scale):
        """Multiplying every pattern count by a constant changes nothing:
        the recursion depends only on pattern FREQUENCIES."""
        from aci_export_spark.operators.fuzzy import fs_em_fixed_point

        scaled = [(g, n * scale) for g, n in patterns]
        assert fs_em_fixed_point(patterns, 3, iters=8) == fs_em_fixed_point(
            scaled, 3, iters=8
        )


_tiny_corpora = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=24),
    min_size=1,
    max_size=6,
)


class TestWordPieceFuzz:
    @given(texts=_tiny_corpora, n_merges=st.integers(1, 12),
           batch_cap=st.integers(1, 4))
    @settings(**SETTINGS)
    def test_reference_merge_table_self_consistency(
        self, tmp_path_factory, texts, n_merges, batch_cap
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from aci_export_spark.llm.wordpiece import (
            CONT,
            _wp_concat,
            wordpiece_reference_python,
        )

        path = str(tmp_path_factory.mktemp("wp") / "docs.parquet")
        pq.write_table(pa.table({"text": texts}), path)
        rows, rounds = wordpiece_reference_python(
            path, n_merges=n_merges, batch_cap=batch_cap
        )
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= n_merges
        for _rank, l, r, new, c, fl, fr, score in rows:
            assert new == _wp_concat(l, r)
            assert not new.startswith(CONT * 2)
            assert c >= 1 and fl >= c and fr >= c
            assert score == float(c) / float(fl * fr)
        assert rounds <= len(rows)

    @given(texts=_tiny_corpora)
    @settings(**SETTINGS)
    def test_encoding_monotonicity(self, tmp_path_factory, texts):
        """Applying the learned merges can only shrink a word's symbol
        count, and every merged symbol round-trips to the original word."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from aci_export_spark.llm.wordpiece import (
            CONT,
            _wp_concat,
            wordpiece_reference_python,
        )

        path = str(tmp_path_factory.mktemp("wp") / "docs.parquet")
        pq.write_table(pa.table({"text": texts}), path)
        rows, _ = wordpiece_reference_python(path, n_merges=8, batch_cap=2)
        words = {
            w
            for t in texts
            for w in t.lower().split()
            if w
        }
        for w in words:
            syms = [c if i == 0 else CONT + c for i, c in enumerate(w)]
            n0 = len(syms)
            for _rank, l, r, new, *_rest in rows:
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == l and x == r:
                        out[-1] = new
                    else:
                        out.append(x)
                syms = out
            assert len(syms) <= n0
            joined = "".join(s[len(CONT):] if s.startswith(CONT) else s for s in syms)
            assert joined == w


_event_sets = st.lists(
    st.tuples(
        st.integers(1, 3),        # key
        st.integers(0, 20),       # day offset
        st.integers(0, 23),       # hour
        st.integers(0, 1_000),    # value scaled
    ),
    min_size=1,
    max_size=30,
)


class TestGapfillFuzz:
    @given(events=_event_sets)
    @settings(max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "12")),
              deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    def test_matches_brute_reference(self, spark, events):
        from aci_export_spark.operators.gapfill import gapfill_locf

        rows = [
            (k, dt.datetime(2024, 5, 1 + d, h), float(v) / 10.0, i)
            for i, (k, d, h, v) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows, schema="k bigint, ts timestamp, v double, tie bigint"
        )
        got = {
            (r["k"], r["bucket"].date()): (
                r["n_events"], r["is_observed"], r["value_locf"], r["gap_age"]
            )
            for r in gapfill_locf(
                df, key=["k"], ts_col="ts", value_col="v", tie_col="tie",
                grain="DAY",
            ).collect()
        }
        # brute reference
        want = {}
        by_key: dict[int, list] = {}
        for k, ts, v, tie in rows:
            by_key.setdefault(k, []).append((ts, tie, v))
        for k, evs in by_key.items():
            days = sorted({ts.date() for ts, _, _ in evs})
            d0, d1 = days[0], days[-1]
            d = d0
            carry = None
            age = 0
            while d <= d1:
                in_day = [(ts, tie, v) for ts, tie, v in evs if ts.date() == d]
                if in_day:
                    carry = max(in_day)[2]
                    age = 0
                else:
                    age += 1
                want[(k, d)] = (len(in_day), bool(in_day), carry, age)
                d += dt.timedelta(days=1)
        assert got == want
