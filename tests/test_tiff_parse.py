"""TIFF synth/parse (multimodal.py): both byte orders, IFD chaining,
left-justified SHORT values, and error gates."""

from __future__ import annotations

import struct

import pytest

from aci_export_spark import multimodal as MM


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5])  # both orders x 1-3 pages
@pytest.mark.parametrize("byte_len", [0, 57, 200])
def test_roundtrip_pages(doc_id, byte_len):
    pages = MM.parse_tiff_meta(MM.synth_tiff(doc_id, byte_len))
    assert len(pages) == 1 + doc_id % 3
    for p, page in enumerate(pages):
        w = 4 + (byte_len + 13 * p) % 29
        h = 3 + (byte_len + 7 * p) % 17
        assert page["page_no"] == p
        assert page["width"] == w and page["height"] == h
        assert page["bits_per_sample"] == 8 and page["compression"] == 1
        assert page["strip_byte_counts"] == w * h


def test_big_endian_short_is_left_justified():
    # Hand-roll a one-entry check: in 'MM' files the SHORT lives in bytes
    # 0-1 of the value field. A parser reading bytes 2-3 gets 0.
    data = MM.synth_tiff(1, 0)  # odd doc_id -> big-endian
    pages = MM.parse_tiff_meta(data)
    assert pages[0]["bits_per_sample"] == 8  # SHORT tag read correctly


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="byte-order magic"):
        MM.parse_tiff_meta(b"XX" + b"\x00" * 10)
    good = bytearray(MM.synth_tiff(0, 0))
    struct.pack_into("<H", good, 2, 43)
    with pytest.raises(ValueError, match="bad magic"):
        MM.parse_tiff_meta(bytes(good))


def test_ifd_cycle_raises():
    data = bytearray(MM.synth_tiff(0, 0))  # little-endian, 1 page
    # point the next-IFD offset back at IFD0 (offset 8)
    n = struct.unpack_from("<H", data, 8)[0]
    struct.pack_into("<I", data, 8 + 2 + 12 * n, 8)
    with pytest.raises(ValueError, match="cycle"):
        MM.parse_tiff_meta(bytes(data))


def test_truncated_ifd_raises():
    data = MM.synth_tiff(0, 0)
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_tiff_meta(data[:16])


def test_missing_required_tag_raises():
    data = bytearray(MM.synth_tiff(0, 0))
    # overwrite the ImageWidth tag id (256) with a private tag id
    n = struct.unpack_from("<H", data, 8)[0]
    assert struct.unpack_from("<H", data, 10)[0] == 256
    struct.pack_into("<H", data, 10, 65000)
    with pytest.raises(ValueError, match="missing required"):
        MM.parse_tiff_meta(bytes(data))
