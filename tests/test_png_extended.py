"""PNG decode beyond the 8-bit non-interlaced core (r8): palette (PLTE),
16-bit, sub-byte grayscale depths, and Adam7 interlace — round-tripped
against a test-side spec encoder. The per-filter-type coverage lives in
test_streaming_multimodal.py; these tests use filters 0/1/2 and focus on
sample expansion and pass reassembly."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aci_export_spark.multimodal import _ADAM7, decode_png_luma


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _pack_rows(samples, depth, channels):
    """samples: (h, w, channels) ints -> filtered scanline bytes (filter 0)."""
    h, w = samples.shape[:2]
    out = bytearray()
    for y in range(h):
        row = samples[y].reshape(-1)
        if depth == 8:
            rb = row.astype(np.uint8).tobytes()
        elif depth == 16:
            rb = row.astype(">u2").tobytes()
        else:
            bits = np.zeros(w * depth, dtype=np.uint8)
            for i, v in enumerate(row):
                for b in range(depth):
                    bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
            rb = np.packbits(bits).tobytes()
        out += b"\x00" + rb
    return bytes(out)


def _png(samples, depth, ctype, channels, interlace=0, plte=None):
    h, w = samples.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    if interlace == 0:
        raw = _pack_rows(samples, depth, channels)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _pack_rows(sub, depth, channels)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def _bt601(rgb):
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def test_palette_png_decodes_via_plte():
    rng = np.random.RandomState(3)
    plte = rng.randint(0, 256, size=(16, 3))
    idx = rng.randint(0, 16, size=(9, 7, 1))
    data = _png(idx, 8, 3, 1, plte=plte)
    np.testing.assert_array_equal(
        decode_png_luma(data), _bt601(plte[idx[:, :, 0]])
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_and_gray(depth):
    rng = np.random.RandomState(depth)
    n = 1 << depth
    # palette at this depth
    plte = rng.randint(0, 256, size=(n, 3))
    idx = rng.randint(0, n, size=(5, 11, 1))  # 11 wide: partial last byte
    data = _png(idx, depth, 3, 1, plte=plte)
    np.testing.assert_array_equal(
        decode_png_luma(data), _bt601(plte[idx[:, :, 0]])
    )
    # grayscale at this depth rescales to the full 8-bit range
    g = rng.randint(0, n, size=(4, 9, 1))
    data = _png(g, depth, 0, 1)
    np.testing.assert_array_equal(
        decode_png_luma(data),
        (g[:, :, 0].astype(np.uint32) * 255 // (n - 1)).astype(np.uint8),
    )


def test_16bit_gray_and_rgb_reduce_to_high_byte():
    rng = np.random.RandomState(9)
    g = rng.randint(0, 65536, size=(6, 5, 1))
    np.testing.assert_array_equal(
        decode_png_luma(_png(g, 16, 0, 1)), (g[:, :, 0] >> 8).astype(np.uint8)
    )
    rgb = rng.randint(0, 65536, size=(4, 4, 3))
    np.testing.assert_array_equal(
        decode_png_luma(_png(rgb, 16, 2, 3)), _bt601(rgb >> 8)
    )


def test_adam7_interlaced_rgb_roundtrip():
    # 13x11: odd dims exercise partial passes; row-identifying gradient so
    # a wrong pass placement cannot accidentally match
    rng = np.random.RandomState(21)
    rgb = rng.randint(0, 256, size=(13, 11, 3))
    data = _png(rgb, 8, 2, 3, interlace=1)
    np.testing.assert_array_equal(decode_png_luma(data), _bt601(rgb))


def test_adam7_small_image_skips_empty_passes():
    # 1x1: only pass 1 emits scanlines; 2x2: passes 1, 6 (x-offset 1) and 7
    for h, w in ((1, 1), (2, 2), (3, 1), (1, 5)):
        g = (np.arange(h * w).reshape(h, w, 1) * 37) % 256
        data = _png(g, 8, 0, 1, interlace=1)
        np.testing.assert_array_equal(
            decode_png_luma(data), g[:, :, 0].astype(np.uint8)
        )


def test_adam7_16bit_palette_combo():
    rng = np.random.RandomState(5)
    g16 = rng.randint(0, 65536, size=(9, 6, 1))
    np.testing.assert_array_equal(
        decode_png_luma(_png(g16, 16, 0, 1, interlace=1)),
        (g16[:, :, 0] >> 8).astype(np.uint8),
    )
    plte = rng.randint(0, 256, size=(4, 3))
    idx = rng.randint(0, 4, size=(10, 10, 1))
    np.testing.assert_array_equal(
        decode_png_luma(_png(idx, 2, 3, 1, interlace=1, plte=plte)),
        _bt601(plte[idx[:, :, 0]]),
    )


def test_palette_index_out_of_range_raises():
    plte = np.zeros((2, 3), dtype=np.uint8)
    idx = np.full((3, 3, 1), 5)
    with pytest.raises(ValueError, match="outside PLTE"):
        decode_png_luma(_png(idx, 8, 3, 1, plte=plte))
