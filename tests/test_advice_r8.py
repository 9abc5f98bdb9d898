"""Round-8 ADVICE regression tests.

1. JPEG marker walk tolerates T.81 B.1.1.2 0xFF fill bytes before any
   marker and length-less standalone markers (TEM, stray RST) outside
   scans — a padded spec-valid stream decodes identically to the
   unpadded one.
2. ``_jpeg_decode_dc_scan`` unpacks the scan tuple's 7th field as
   ``_dri`` (the restart interval snapshot), not ``tables``.
3. ``_RANKER_AGREEMENT_ORACLE`` is guarded by an assert on the split
   marker, so rewording ``_HYBRID_RRF_ORACLE`` fails at import, not at
   oracle runtime.
4. ``dup_gram_position_stats`` with ``dup_table=None`` explodes the
   corpus once: the result plan reads the checkpointed gram frame in
   every branch (no Generate/explode survives), and the rows equal the
   shared-artifact path's.
"""

from __future__ import annotations

import inspect

import numpy as np
import pytest

from aci_export_spark.multimodal import decode_jpeg_luma

from tests.test_jpeg_decode import _Q_ONES, _dc_only_blocks, _jpeg_encode


def _pad_jpeg(data: bytes) -> bytes:
    """Insert 0xFF fill runs before the first DQT marker and a standalone
    TEM (0xFF01) segment boundary before SOS — both legal per T.81."""
    i = data.index(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    j = padded.index(b"\xff\xda")
    return padded[:j] + b"\xff\x01" + padded[j:]


def test_fill_bytes_and_tem_marker_tolerated():
    blocks = _dc_only_blocks([96, 160, 24, 240])
    data = _jpeg_encode(16, 16, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES})
    base = decode_jpeg_luma(data)
    padded = _pad_jpeg(data)
    assert padded != data
    out = decode_jpeg_luma(padded)
    assert np.array_equal(np.asarray(base), np.asarray(out))


def test_stray_rst_outside_scan_is_lengthless():
    blocks = _dc_only_blocks([128])
    data = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES})
    i = data.index(b"\xff\xdb")
    # a stray RST0 between segments must be skipped without a length read
    padded = data[:i] + b"\xff\xd0" + data[i:]
    assert np.array_equal(
        np.asarray(decode_jpeg_luma(data)),
        np.asarray(decode_jpeg_luma(padded)),
    )


def test_dc_scan_unpacks_dri_not_tables():
    from aci_export_spark.multimodal import _jpeg_decode_dc_scan

    src = inspect.getsource(_jpeg_decode_dc_scan)
    assert "_dri = scan" in src
    assert "tables = scan" not in src


def test_ranker_agreement_oracle_split_guarded():
    from aci_export_spark import harness_analytics as ha

    assert ", fused AS" in ha._HYBRID_RRF_ORACLE
    # the split actually removed the fused tail — the agreement oracle
    # must not contain the hybrid query's fusion CTE
    assert "fused AS" not in ha._RANKER_AGREEMENT_ORACLE
    assert "kpairs" in ha._RANKER_AGREEMENT_ORACLE


def test_dup_position_stats_default_scans_once(spark):
    from aci_export_spark.llm.dedup import (
        dup_gram_position_stats,
        duplicated_gram_table,
    )

    rows = [
        ("a", "one two three four five six seven eight nine ten"),
        ("b", "one two three four five six seven eight different tail"),
        ("c", "totally unrelated words in this tiny document here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    direct = dup_gram_position_stats(df, n=8, min_docs=2)
    # scan-once: with dup_table=None the explode is checkpointed before
    # fan-out, so no Generate (explode) node survives in the final plan
    plan = direct._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    shared = dup_gram_position_stats(
        df, n=8, min_docs=2, dup_table=duplicated_gram_table(df, n=8, min_docs=2)
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, shared.collect())
    )
