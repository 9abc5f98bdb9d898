"""Matroska EBML walk: round-trip property tests plus the corruption
matrix — VINT framing, unknown-size rejection, parent-extent accounting,
DocType validation, and the reflected-CRC element."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark import multimodal as MM


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_mkv_roundtrip(doc_id: int, byte_len: int) -> None:
    tracks = MM.parse_mkv_tracks(MM.synth_mkv(doc_id, byte_len))
    assert len(tracks) == 1 + doc_id % 3
    for p, t in enumerate(tracks):
        assert t["track_no"] == p + 1
        assert t["track_type"] == ["video", "audio", "subtitle"][p % 3]
        assert t["codec_id"] == MM._MKV_CODECS[p % 3]
        assert t["timestamp_scale"] == 1_000_000 + (byte_len % 7) * 1000
        assert t["doctype"] == "matroska"


def test_mkv_crc_detects_corruption() -> None:
    raw = bytearray(MM.synth_mkv(3, 100))
    i = bytes(raw).index(b"doc3")
    raw[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        MM.parse_mkv_tracks(bytes(raw))


def test_mkv_crc_is_reflected_not_direct() -> None:
    # the Info CRC must be zlib's reflected CRC; re-stamping it with the
    # Ogg direct-form CRC over the same bytes must fail verification
    raw = bytearray(MM.synth_mkv(1, 50))
    crc_at = bytes(raw).index(b"\xbf\x84") + 2  # CRC-32 elem, size 4
    covered_start = crc_at + 4
    info_id = bytes(raw).index(b"\x15\x49\xa9\x66")
    # recompute the covered span from the parser itself as ground truth:
    # corrupt nothing, just overwrite CRC with the WRONG convention
    covered = bytes(raw)[covered_start:]
    # truncate covered to the Info payload end by asking zlib what matches
    for end in range(len(covered), 0, -1):
        if zlib.crc32(covered[:end]) == int.from_bytes(
            bytes(raw)[crc_at : crc_at + 4], "little"
        ):
            span = covered[:end]
            break
    else:
        pytest.fail("could not locate the CRC-covered span")
    wrong = MM.ogg_crc(span).to_bytes(4, "little")
    if wrong == bytes(raw)[crc_at : crc_at + 4]:
        pytest.skip("conventions collide on this payload (astronomical)")
    raw[crc_at : crc_at + 4] = wrong
    with pytest.raises(ValueError, match="CRC"):
        MM.parse_mkv_tracks(bytes(raw))


def test_mkv_unknown_size_rejected() -> None:
    # craft an element with the all-ones 1-byte size (0xFF)
    data = b"\x1a\x45\xdf\xa3\xff" + b"\x00" * 4
    with pytest.raises(ValueError, match="unknown-size|truncated|width"):
        MM._walk_ebml(data, 0, len(data))


def test_mkv_overrun_detected() -> None:
    # child size larger than parent extent
    inner = b"\x42\x86" + b"\x85" + b"\x01"  # claims 5 bytes, has 1
    with pytest.raises(ValueError, match="overruns|truncated|missed"):
        MM._walk_ebml(inner, 0, len(inner))


def test_mkv_walk_must_land_on_parent_end() -> None:
    good = MM.synth_mkv(0, 10)
    with pytest.raises(ValueError, match="missed|overruns|truncated"):
        MM._walk_ebml(good + b"\x81", 0, len(good) + 1)


def test_mkv_bad_doctype() -> None:
    raw = MM.synth_mkv(0, 10).replace(b"matroska", b"matroskb")
    with pytest.raises(ValueError, match="DocType"):
        MM.parse_mkv_tracks(raw)


def test_mkv_vint_widths_occur() -> None:
    # the Void element pushes every Segment payload past 127 bytes, so
    # its size VINT is >= 2 bytes wide while leaf sizes are 1 byte —
    # both widths genuinely exercised
    raw = MM.synth_mkv(2, 100)
    seg_at = raw.index(b"\x18\x53\x80\x67")
    lead = raw[seg_at + 4]
    assert lead & 0x80 == 0  # not a 1-byte VINT
    assert lead & 0x40  # 2-byte VINT marker
