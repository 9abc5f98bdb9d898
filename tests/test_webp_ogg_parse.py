"""WebP RIFF-walk and Ogg page-walk parsers: round-trip property tests,
the independent Ogg CRC witness vector, and the corruption matrix (every
validation in the parser must actually fire)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark import multimodal as MM


# ---------------------------------------------------------------------------
# WebP
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_webp_roundtrip(doc_id: int, byte_len: int) -> None:
    info = MM.parse_webp_info(MM.synth_webp(doc_id, byte_len))
    assert info["width"] == 16 + doc_id % 1200
    assert info["height"] == 16 + byte_len % 700
    assert info["format"] == ("VP8L" if doc_id % 2 else "VP8")
    assert info["has_alpha"] == (byte_len % 3 == 0)
    assert info["has_exif"] == (doc_id % 5 == 0)
    assert info["n_chunks"] == (
        2
        + (1 if (doc_id % 2 == 0 and byte_len % 3 == 0) else 0)
        + (1 if doc_id % 5 == 0 else 0)
    )


def test_webp_bad_magic() -> None:
    data = bytearray(MM.synth_webp(2, 57))
    data[0] ^= 0x01
    with pytest.raises(ValueError, match="magic"):
        MM.parse_webp_info(bytes(data))


def test_webp_riff_size_mismatch() -> None:
    data = MM.synth_webp(2, 57) + b"\x00"
    with pytest.raises(ValueError, match="RIFF size"):
        MM.parse_webp_info(data)


def test_webp_bad_vp8_sync() -> None:
    data = bytearray(MM.synth_webp(2, 57))  # even doc_id -> VP8 lossy
    i = data.index(b"\x9d\x01\x2a")
    data[i] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        MM.parse_webp_info(bytes(data))


def test_webp_bad_vp8l_signature() -> None:
    data = bytearray(MM.synth_webp(3, 57))  # odd doc_id -> VP8L
    i = data.index(b"VP8L") + 8
    data[i] ^= 0xFF
    with pytest.raises(ValueError, match="VP8L"):
        MM.parse_webp_info(bytes(data))


def test_webp_canvas_mismatch() -> None:
    data = bytearray(MM.synth_webp(3, 57))
    i = data.index(b"VP8X") + 8 + 4  # canvas width-1, 24-bit LE
    data[i] ^= 0x01
    with pytest.raises(ValueError, match="canvas"):
        MM.parse_webp_info(bytes(data))


def test_webp_alpha_flag_mismatch() -> None:
    # byte_len % 3 == 0 -> alpha set in both VP8X and the VP8L bit; clear
    # only the VP8X flag so the cross-check fires
    data = bytearray(MM.synth_webp(3, 57))
    i = data.index(b"VP8X") + 8
    assert data[i] & 0x10
    data[i] &= ~0x10
    with pytest.raises(ValueError, match="alpha"):
        MM.parse_webp_info(bytes(data))


def test_webp_padding_rule_exercised() -> None:
    # doc_id % 5 == 0 -> EXIF chunk; payload 7 + doc_id % 4 is odd for
    # doc_id % 4 in {0, 2}, so doc_id=10 carries a pad byte the walk must
    # step over to land exactly on EOF
    data = MM.synth_webp(10, 57)
    exif_len = struct.unpack_from("<I", data, data.index(b"EXIF") + 4)[0]
    assert exif_len % 2 == 1
    assert MM.parse_webp_info(data)["has_exif"] is True


# ---------------------------------------------------------------------------
# Ogg
# ---------------------------------------------------------------------------


def test_ogg_crc_witness_vector() -> None:
    # CRC-32/POSIX shares poly/init/reflection with Ogg and differs only
    # by a final xorout of 0xFFFFFFFF; its published check value for
    # "123456789" is 0x765E7680, so the Ogg variant must be its complement.
    assert MM.ogg_crc(b"123456789") == 0x765E7680 ^ 0xFFFFFFFF
    # and NOT zlib's reflected CRC
    import zlib

    assert MM.ogg_crc(b"123456789") != zlib.crc32(b"123456789")


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_ogg_roundtrip(doc_id: int, byte_len: int) -> None:
    pages = MM.parse_ogg_pages(MM.synth_ogg(doc_id, byte_len))
    assert len(pages) == 2 + byte_len % 4
    assert pages[0]["is_bos"] and pages[-1]["is_eos"]
    for p in pages:
        plen = 200 + (doc_id * 7 + p["page_no"] * 13) % 400
        assert p["payload_len"] == plen
        assert p["n_segments"] == plen // 255 + 1
        assert p["serial"] == 4096 + doc_id % 1000
        assert p["granule"] == (p["page_no"] + 1) * (100 + doc_id % 50)


def test_ogg_zero_lacing_boundary() -> None:
    # payload_len == 510 (an exact 255 multiple) must produce the
    # trailing zero lacing value: segments [255, 255, 0]
    # 200 + (d*7 + p*13) % 400 == 510 -> (d*7 + p*13) % 400 == 310;
    # d=30, p=10 is out of page range, so solve within p<6: d=90, p=0 ->
    # 630 % 400 = 230; search instead:
    found = None
    for d in range(400):
        for p in range(2 + 3999 % 4):
            if 200 + (d * 7 + p * 13) % 400 == 510:
                found = (d, p)
                break
        if found:
            break
    assert found is not None
    d, p = found
    pages = MM.parse_ogg_pages(MM.synth_ogg(d, 3999))
    assert pages[p]["payload_len"] == 510
    assert pages[p]["n_segments"] == 3  # [255, 255, 0]


def test_ogg_crc_corruption_detected() -> None:
    data = bytearray(MM.synth_ogg(3, 300))
    data[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        MM.parse_ogg_pages(bytes(data))


def test_ogg_truncation_detected() -> None:
    data = MM.synth_ogg(3, 300)
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_ogg_pages(data[:-5])


def test_ogg_sequence_gap_detected() -> None:
    # renumber page 1's sequence field (offset 18 in its header) and
    # re-CRC so only the contiguity check can catch it
    data = bytearray(MM.synth_ogg(3, 300))
    # find the second page
    second = data.index(b"OggS", 4)
    struct.pack_into("<I", data, second + 18, 7)
    # zero CRC, recompute over that page
    third = data.find(b"OggS", second + 4)
    end = len(data) if third == -1 else third
    struct.pack_into("<I", data, second + 22, 0)
    crc = MM.ogg_crc(bytes(data[second:end]))
    struct.pack_into("<I", data, second + 22, crc)
    with pytest.raises(ValueError, match="sequence"):
        MM.parse_ogg_pages(bytes(data))


def test_ogg_version_check() -> None:
    data = bytearray(MM.synth_ogg(3, 300))
    data[4] = 1
    with pytest.raises(ValueError, match="version"):
        MM.parse_ogg_pages(bytes(data))
