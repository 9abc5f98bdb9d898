"""BMP synth/decode (multimodal.py): round-trip against the pixel formula
for both row orientations, stride-padding isolation, and error gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aci_export_spark import multimodal as MM


def _expected_rgb(doc_id: int, w: int, h: int) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (3 * doc_id + 13 * x + 17 * y) % 256
    g = (2 * doc_id + 5 * x + 11 * y) % 256
    b = (1 * doc_id + 3 * x + 7 * y) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7])  # even=bottom-up, odd=top-down
@pytest.mark.parametrize("byte_len", [0, 1, 2, 3, 57, 200])
def test_roundtrip_both_orientations(doc_id, byte_len):
    data = MM.synth_bmp(doc_id, byte_len)
    rgb = MM.decode_bmp_pixels(data)
    w = 4 + byte_len % 29
    h = 3 + byte_len % 17
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb, _expected_rgb(doc_id, w, h))


def test_stride_padding_never_leaks():
    # width 5 -> stride 16, 1 pad byte of 0xAA per row; a stride bug would
    # shear rows and pull 0xAA into pixels. byte_len=1 -> w=5, h=4.
    data = MM.synth_bmp(4, 1)
    rgb = MM.decode_bmp_pixels(data)
    assert rgb.shape[1] == 5
    assert not (rgb == 0xAA).all(axis=2).any(), "pad sentinel leaked into pixels"


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        MM.decode_bmp_pixels(b"PM" + b"\x00" * 60)


def test_truncated_pixels_raise():
    data = MM.synth_bmp(2, 10)
    with pytest.raises(ValueError, match="truncated pixel"):
        MM.decode_bmp_pixels(data[:-8])


def test_unsupported_depth_raises():
    data = bytearray(MM.synth_bmp(2, 10))
    struct.pack_into("<H", data, 28, 8)  # biBitCount 24 -> 8
    with pytest.raises(ValueError, match="bpp"):
        MM.decode_bmp_pixels(bytes(data))


def test_rle_compression_raises():
    data = bytearray(MM.synth_bmp(2, 10))
    struct.pack_into("<I", data, 30, 1)  # biCompression BI_RGB -> BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        MM.decode_bmp_pixels(bytes(data))
