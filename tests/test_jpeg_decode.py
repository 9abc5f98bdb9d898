"""Baseline-JPEG luma decode (multimodal.decode_jpeg_luma): round-trips
against a minimal test-side T.81 baseline ENCODER (canonical Huffman,
byte stuffing, restart markers) plus an independent direct-formula IDCT
reference, and the progressive/arithmetic/precision gates.

Exactness strategy: DC-only blocks with an all-ones quant table decode
losslessly (IDCT of a pure-DC block is constant: F00/8), so container
walk, Huffman, dequant, MCU layout, subsampling traversal, restarts, and
byte stuffing are all verified bit-exactly; general AC content is checked
against a from-the-spec O(8^4) IDCT implemented independently here."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from aci_export_spark.multimodal import (
    decode_image_luma,
    decode_jpeg_luma,
    parse_image_dims,
)

# --------------------------------------------------------------------------
# minimal encoder (tests only)
# --------------------------------------------------------------------------

_ZIG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: DC categories 0..11, all at code length 4 (12 of 16 slots: valid canonical)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
#: AC symbols at code length 8: EOBn (n 0-14, incl. plain EOB), ZRL, and
#: every (run 0-15, size 1-10) — the full progressive symbol space
_AC_SYMBOLS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _enc_table(counts, symbols):
    enc, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def pad(self):  # 1-fill to byte boundary (T.81 F.1.2.3)
        while self.n:
            self.write(1, 1)


def _encode_block(w, zz, pred, dc_enc, ac_enc):
    diff = int(zz[0]) - pred
    t = abs(diff).bit_length()
    w.write(*dc_enc[t])
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            w.write(*ac_enc[0x00])  # EOB
            break
        while run > 15:
            w.write(*ac_enc[0xF0])  # ZRL
            run -= 16
        v = int(zz[k])
        s = abs(v).bit_length()
        w.write(*ac_enc[(run << 4) | s])
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    return int(zz[0])


def _jpeg_encode(width, height, comps, blocks_per_comp, qtabs, dri=0,
                 sof=0xC0):
    """comps: [(comp_id, h, v, tq)]; blocks_per_comp: per component a LIST
    of zigzag int64[64] QUANTIZED coefficient vectors in MCU traversal
    order; qtabs: {tq: int[64] zigzag}."""
    out = bytearray(b"\xff\xd8")
    for tq, q in sorted(qtabs.items()):
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq])
        out += bytes(int(x) for x in q)
    body = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, ch, cv, tq in comps:
        body += bytes([cid, (ch << 4) | cv, tq])
    out += bytes([0xFF, sof]) + struct.pack(">H", 2 + len(body)) + body
    for tc, counts, symbols in (
        (0, _DC_COUNTS, _DC_SYMBOLS),
        (1, _AC_COUNTS, _AC_SYMBOLS),
    ):
        seg = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_enc, ac_enc = _enc_table(_DC_COUNTS, _DC_SYMBOLS), _enc_table(
        _AC_COUNTS, _AC_SYMBOLS
    )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    iters = [iter(b) for b in blocks_per_comp]
    preds = [0] * len(comps)
    w = _BitWriter()
    rst = 0
    mcu_count = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                w.pad()
                out += bytes(w.out)
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                for _ in range(ch * cv):
                    preds[ci] = _encode_block(
                        w, next(iters[ci]), preds[ci], dc_enc, ac_enc
                    )
            mcu_count += 1
    w.pad()
    out += bytes(w.out) + b"\xff\xd9"
    return bytes(out)


def _dc_only_blocks(values):
    """Zigzag vectors encoding constant 8x8 blocks exactly: q=1 and
    F00 = 8*(value-128) make the decoded block == value everywhere."""
    blocks = []
    for v in values:
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = 8 * (int(v) - 128)
        blocks.append(zz)
    return blocks


_Q_ONES = np.ones(64, dtype=np.int64)


def _ref_idct(coef):
    """Independent direct-formula IDCT (T.81 A.3.3), O(8^4) — deliberately
    NOT the decoder's matrix formulation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4
    return out


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_grayscale_constant_blocks_exact_with_crop():
    # 20x12: non-multiple-of-8 dims force edge-block cropping
    w, h = 20, 12
    vals = np.array([[40, 128, 250], [5, 200, 99]])  # 2x3 blocks
    blocks = _dc_only_blocks(vals.reshape(-1))
    data = _jpeg_encode(w, h, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES})
    luma = decode_jpeg_luma(data)
    assert luma.shape == (h, w)
    expect = np.kron(vals, np.ones((8, 8), dtype=np.uint8))[:h, :w]
    np.testing.assert_array_equal(luma, expect)
    assert parse_image_dims(data) == (w, h)
    # the dispatcher routes JPEG here now
    np.testing.assert_array_equal(decode_image_luma(data), expect)


def test_ycbcr_420_luma_exact_chroma_consumed():
    # 32x32 4:2:0 -> 2x2 MCUs, 4 Y blocks per MCU + 1 Cb + 1 Cr.
    w = h = 32
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, size=(4, 4))  # 4x4 grid of constant Y blocks
    # Y traversal order: per MCU (my,mx), blocks (by,bx) row-major
    yblocks = []
    for my in range(2):
        for mx in range(2):
            for by in range(2):
                for bx in range(2):
                    yblocks.extend(_dc_only_blocks([vals[my * 2 + by, mx * 2 + bx]]))
    # chroma: nontrivial random AC content the decoder must entropy-consume
    def chroma():
        out = []
        for _ in range(4):
            zz = np.zeros(64, dtype=np.int64)
            idx = rng.choice(np.arange(1, 64), size=12, replace=False)
            zz[idx] = rng.randint(-180, 181, size=12)
            zz[0] = rng.randint(-900, 901)
            out.append(zz)
        return out

    data = _jpeg_encode(
        w, h,
        [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)],
        [yblocks, chroma(), chroma()],
        {0: _Q_ONES},
    )
    luma = decode_jpeg_luma(data)
    expect = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    np.testing.assert_array_equal(luma, expect)


def test_general_ac_content_matches_reference_idct_with_quant():
    # random sparse quantized coefficients, non-trivial quant table:
    # decoder must dequantize, de-zigzag, and IDCT exactly like the
    # independent direct-formula reference
    rng = np.random.RandomState(7)
    q = (1 + (np.arange(64) * 5) % 23).astype(np.int64)  # varied, in zigzag
    blocks, expects = [], []
    for _ in range(6):
        zz = np.zeros(64, dtype=np.int64)
        idx = rng.choice(np.arange(1, 64), size=15, replace=False)
        zz[idx] = rng.randint(-60, 61, size=15)
        zz[0] = rng.randint(-800, 801)
        blocks.append(zz)
        coef = np.zeros((8, 8))
        for k in range(64):
            coef[_ZIG[k] // 8, _ZIG[k] % 8] = zz[k] * q[k]
        expects.append(
            np.clip(np.round(_ref_idct(coef)) + 128, 0, 255).astype(np.uint8)
        )
    data = _jpeg_encode(48, 8, [(1, 1, 1, 0)], [blocks], {0: q})
    luma = decode_jpeg_luma(data)
    for b in range(6):
        np.testing.assert_array_equal(luma[:, b * 8 : b * 8 + 8], expects[b])


def test_restart_markers_reset_dc_predictors():
    # DRI=2 over 6 blocks: RST fires twice; DC prediction must restart at 0
    vals = [10, 20, 30, 40, 50, 60]
    data = _jpeg_encode(
        48, 8, [(1, 1, 1, 0)], [_dc_only_blocks(vals)], {0: _Q_ONES}, dri=2
    )
    assert data.count(b"\xff\xd0") + data.count(b"\xff\xd1") + data.count(
        b"\xff\xd2"
    ) >= 2
    luma = decode_jpeg_luma(data)
    expect = np.kron(np.array([vals]), np.ones((8, 8), dtype=np.uint8))
    np.testing.assert_array_equal(luma, expect)


def test_byte_stuffing_roundtrip():
    # size-9 magnitudes write long all-ones runs -> 0xFF bytes -> stuffing
    zz = np.zeros(64, dtype=np.int64)
    zz[1:20] = 511
    data = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [[zz]], {0: _Q_ONES})
    assert b"\xff\x00" in data  # the case is actually exercised
    coef = np.zeros((8, 8))
    for k in range(64):
        coef[_ZIG[k] // 8, _ZIG[k] % 8] = zz[k]
    expect = np.clip(np.round(_ref_idct(coef)) + 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(decode_jpeg_luma(data), expect)


def test_extended_sequential_sof1_decodes():
    blocks = _dc_only_blocks([77])
    data = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES}, sof=0xC1)
    assert int(decode_jpeg_luma(data)[0, 0]) == 77


def test_gates_arithmetic_and_errors():
    blocks = _dc_only_blocks([90])
    # a SOF2 frame whose single scan claims the full 0..63 band is
    # malformed progressive (a DC scan must have Se=0) — progressive
    # itself now DECODES (test_jpeg_progressive.py)
    prog = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES}, sof=0xC2)
    with pytest.raises(ValueError, match="DC scan with Se"):
        decode_jpeg_luma(prog)
    arith = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES}, sof=0xC9)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg_luma(arith)
    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg_luma(b"\x89PNG1234")
    good = _jpeg_encode(8, 8, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES})
    with pytest.raises(ValueError, match="truncated|missing"):
        # cut inside the entropy stream: the block cannot complete
        decode_jpeg_luma(good[: len(good) - 3] + b"\xff\xd9")


def test_phash_runs_on_real_jpeg_pixels():
    from aci_export_spark.multimodal import (
        PHASH_COLS,
        PHASH_ROWS,
        _image_phash,
        downscale_luma,
    )

    # gradient-ish block image: distinct dHash from a flat one
    vals = np.arange(63, 64 * 63, 63).reshape(7, 9) % 256
    blocks = _dc_only_blocks(vals.reshape(-1))
    data = _jpeg_encode(72, 56, [(1, 1, 1, 0)], [blocks], {0: _Q_ONES})
    h = _image_phash(data)
    grid = downscale_luma(decode_jpeg_luma(data), PHASH_ROWS, PHASH_COLS + 1)
    expect = 0
    for r in range(PHASH_ROWS):
        for c in range(PHASH_COLS):
            if int(grid[r, c]) < int(grid[r, c + 1]):
                expect |= 1 << (r * PHASH_COLS + c)
    assert h == expect and h != 0
