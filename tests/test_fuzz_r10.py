"""Hypothesis fuzz for the round-10 operators.

- EXIF: random byte corruption of a genuine APP1 JPEG must either parse to
  a fully-typed dict or raise the documented ValueError — never
  struct.error / IndexError / UnicodeDecodeError out of an executor task
  (the multimodal decoder robustness contract).
- Unigram Viterbi: on random small vocabularies and words the DP's
  segmentation probability equals the brute-force max over all
  segmentations (exact rationals), the iterative and memoized DPs agree,
  and segmentation always reconstructs the word.
"""

from __future__ import annotations

import itertools
import os
from fractions import Fraction

from hypothesis import HealthCheck, given, settings, strategies as st

from aci_export_spark.llm.unigram import _ref_viterbi, viterbi_segment
from aci_export_spark.multimodal import parse_jpeg_exif, synth_jpeg_exif

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


class TestExifFuzz:
    @given(
        doc_id=st.integers(0, 10_000),
        byte_len=st.integers(0, 10_000),
        pos=st.integers(0, 200),
        val=st.integers(0, 255),
    )
    @settings(**SETTINGS)
    def test_single_byte_corruption_never_leaks_raw_errors(
        self, doc_id, byte_len, pos, val
    ):
        data = bytearray(synth_jpeg_exif(doc_id, byte_len))
        data[pos % len(data)] = val
        try:
            out = parse_jpeg_exif(bytes(data))
        except ValueError:
            return
        assert set(out) == {"orientation", "make", "capture_dt", "iso", "pixel_x"}
        assert 1 <= out["orientation"] <= 8
        assert isinstance(out["make"], str) and isinstance(out["capture_dt"], str)

    @given(
        doc_id=st.integers(0, 10_000),
        byte_len=st.integers(0, 10_000),
        cut=st.integers(0, 300),
    )
    @settings(**SETTINGS)
    def test_truncation_never_leaks_raw_errors(self, doc_id, byte_len, cut):
        data = synth_jpeg_exif(doc_id, byte_len)
        try:
            parse_jpeg_exif(data[: cut % (len(data) + 1)])
        except ValueError:
            pass

    @given(doc_id=st.integers(0, 100_000), byte_len=st.integers(0, 100_000))
    @settings(**SETTINGS)
    def test_round_trip_holds_for_any_params(self, doc_id, byte_len):
        out = parse_jpeg_exif(synth_jpeg_exif(doc_id, byte_len))
        assert out["orientation"] == 1 + doc_id % 8
        assert out["iso"] == 100 * (1 + doc_id % 32)
        assert out["pixel_x"] == 640 + byte_len % 3000


vocab_pieces = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=3),
    st.integers(0, 20),
    min_size=1,
    max_size=8,
)


class TestUnigramViterbiFuzz:
    @given(word=st.text(alphabet="abc", min_size=1, max_size=7), scores=vocab_pieces)
    @settings(**SETTINGS)
    def test_dp_is_optimal_and_reconstructs(self, word, scores):
        total = sum(scores.values()) + len(scores)
        seg = viterbi_segment(word, scores, total, max_piece_len=3)
        assert "".join(seg) == word
        got = Fraction(1)
        for p in seg:
            got *= Fraction(scores.get(p, 0) + 1, total)
        best = Fraction(0)
        n = len(word)
        for bits in itertools.product([0, 1], repeat=n - 1):
            cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
            pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            if any(len(p) > 3 for p in pieces):
                continue
            if any(len(p) > 1 and p not in scores for p in pieces):
                continue
            prob = Fraction(1)
            for p in pieces:
                prob *= Fraction(scores.get(p, 0) + 1, total)
            best = max(best, prob)
        assert got == best

    @given(word=st.text(alphabet="abcd", min_size=1, max_size=12), scores=vocab_pieces)
    @settings(**SETTINGS)
    def test_iterative_equals_memoized(self, word, scores):
        total = sum(scores.values()) + len(scores)
        assert viterbi_segment(word, scores, total, 3) == _ref_viterbi(
            word, scores, total, 3
        )
