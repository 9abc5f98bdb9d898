"""Progressive JPEG decode (multimodal.decode_jpeg_luma, SOF2): round-trips
against a test-side progressive ENCODER implementing T.81 G.1.2 — spectral
selection, successive approximation (DC/AC first + refinement passes,
EOB-run batching, inline correction bits), interleaved DC scans, restart
intervals — verified DIFFERENTIALLY against the already-independently-
verified baseline path: the same quantized coefficients encoded both ways
must decode to identical luma."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aci_export_spark.multimodal import decode_jpeg_luma

from tests.test_jpeg_decode import (
    _AC_COUNTS,
    _AC_SYMBOLS,
    _DC_COUNTS,
    _DC_SYMBOLS,
    _BitWriter,
    _Q_ONES,
    _enc_table,
    _jpeg_encode,
)

_DC_ENC = _enc_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _enc_table(_AC_COUNTS, _AC_SYMBOLS)


def _dht_segment():
    out = b""
    for tc, counts, symbols in (
        (0, _DC_COUNTS, _DC_SYMBOLS),
        (1, _AC_COUNTS, _AC_SYMBOLS),
    ):
        seg = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    return out


def _trunc(v: int, al: int) -> int:
    """AC point transform: magnitude truncation (toward zero)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _sig_bits(w: _BitWriter, t: int, s: int):
    w.write(t if t >= 0 else t + (1 << s) - 1, s)


class _EobState:
    """EOB-run batching with the refinement-pass correction-bit buffer:
    bits observed during covered blocks are emitted right after the EOBn
    symbol, in block order (the order the decoder reads them back)."""

    def __init__(self, w: _BitWriter):
        self.w = w
        self.run = 0
        self.bits: list[int] = []

    def add(self, bits):
        self.run += 1
        self.bits.extend(bits)

    def flush(self):
        if not self.run:
            return
        r = self.run.bit_length() - 1
        self.w.write(*_AC_ENC[r << 4])
        if r:
            self.w.write(self.run - (1 << r), r)
        for b in self.bits:
            self.w.write(b, 1)
        self.run = 0
        self.bits = []


def _encode_dc_scan(w, grids, comps_meta, scan_cis, ah, al, mcus_x, mcus_y):
    preds = {ci: 0 for ci in scan_cis}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in scan_cis:
                ch, cv = comps_meta[ci]
                for by in range(cv):
                    for bx in range(ch):
                        v = int(grids[ci][my * cv + by, mx * ch + bx, 0])
                        if ah == 0:
                            val = v >> al  # arithmetic shift per spec
                            diff = val - preds[ci]
                            preds[ci] = val
                            t = abs(diff).bit_length()
                            w.write(*_DC_ENC[t])
                            if t:
                                _sig_bits(w, diff, t)
                        else:
                            w.write((v >> al) & 1, 1)


def _encode_ac_first(w, grid, n_by, n_bx, ss, se, al):
    eob = _EobState(w)
    for by in range(n_by):
        for bx in range(n_bx):
            zz = grid[by, bx]
            vals = [_trunc(int(zz[k]), al) for k in range(ss, se + 1)]
            if not any(vals):
                eob.add([])
                continue
            eob.flush()
            r = 0
            for t in vals:
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    w.write(*_AC_ENC[0xF0])
                    r -= 16
                s = abs(t).bit_length()
                w.write(*_AC_ENC[(r << 4) | s])
                _sig_bits(w, t, s)
                r = 0
            if r:
                eob.add([])
    eob.flush()


def _encode_ac_refine(w, grid, n_by, n_bx, ss, se, al):
    """Mirror of the decoder's consumption order exactly: a ZRL consumes
    16 zero-HISTORY slots (correction bits for history positions read
    inline as they are passed), a (r<<4)|1 symbol consumes r zero-history
    slots + one new ±1<<Al (sign bit, then the inline corrections), and an
    EOBn covers the block tail + following blocks with their correction
    bits appended after the run bits in block order."""
    eob = _EobState(w)
    for by in range(n_by):
        for bx in range(n_bx):
            zz = grid[by, bx]
            band = [int(zz[k]) for k in range(ss, se + 1)]
            history = [(abs(v) >> (al + 1)) != 0 for v in band]
            newsig = [
                (abs(v) >> al) == 1 and not h for v, h in zip(band, history)
            ]
            corr = [(abs(v) >> al) & 1 for v in band]
            n = len(band)
            if not any(newsig):
                # whole block is an EOB event; its history correction bits
                # ride the run buffer
                eob.add([corr[i] for i in range(n) if history[i]])
                continue
            eob.flush()
            i = 0
            while True:
                nxt = next((j for j in range(i, n) if newsig[j]), None)
                if nxt is None:
                    if i < n:  # decoder will read one more symbol: EOB
                        eob.add([corr[j] for j in range(i, n) if history[j]])
                    break
                zeros = sum(1 for j in range(i, nxt) if not history[j])
                while zeros > 15:
                    # ZRL: decoder passes exactly 16 zero-history slots,
                    # reading corrections inline — advance i the same way
                    w.write(*_AC_ENC[0xF0])
                    cnt = 0
                    bits = []
                    while cnt < 16:
                        if history[i]:
                            bits.append(corr[i])
                        else:
                            cnt += 1
                        i += 1
                    for b in bits:
                        w.write(b, 1)
                    zeros -= 16
                w.write(*_AC_ENC[(zeros << 4) | 1])
                w.write(1 if band[nxt] > 0 else 0, 1)
                for j in range(i, nxt):
                    if history[j]:
                        w.write(corr[j], 1)
                i = nxt + 1
    eob.flush()


def _prog_jpeg(width, height, comps, grids, qtab, scan_plan, dri=0):
    """comps: [(comp_id, ch, cv)] (shared quant table 0); grids: per comp
    (n_by, n_bx, 64) FULL-precision quantized zigzag coefficients, padded
    to MCU multiples; scan_plan entries:
      ("dc", [comp_indices], ah, al)
      ("ac", comp_index, ss, se, ah, al)"""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0])
    out += bytes(int(x) for x in qtab)
    body = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, ch, cv in comps:
        body += bytes([cid, (ch << 4) | cv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(body)) + body
    out += _dht_segment()
    comps_meta = [(ch, cv) for _cid, ch, cv in comps]
    first_scan = True
    for scan in scan_plan:
        if dri:
            # DRI persists across scans until redefined (the decoder obeys
            # this), so this encoder restarts only the FIRST scan and
            # explicitly resets DRI to 0 before the rest
            out += b"\xff\xdd" + struct.pack(">HH", 4, dri if first_scan else 0)
        use_dri = dri if first_scan else 0
        first_scan = False
        w = _BitWriter()
        if scan[0] == "dc":
            _, cis, ah, al = scan
            sos = bytes([len(cis)])
            for ci in cis:
                sos += bytes([comps[ci][0], 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            if use_dri:
                # restart-aware DC encode: split at MCU multiples
                out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                out += _encode_dc_with_restarts(
                    grids, comps_meta, cis, ah, al, mcus_x, mcus_y, use_dri
                )
                continue
            _encode_dc_scan(w, grids, comps_meta, cis, ah, al, mcus_x, mcus_y)
        else:
            _, ci, ss, se, ah, al = scan
            ch, cv = comps_meta[ci]
            cw = -(-width * ch // hmax)
            chh = -(-height * cv // vmax)
            n_by, n_bx = -(-chh // 8), -(-cw // 8)
            sos = bytes([1, comps[ci][0], 0x00, ss, se, (ah << 4) | al])
            if ah == 0:
                _encode_ac_first(w, grids[ci], n_by, n_bx, ss, se, al)
            else:
                _encode_ac_refine(w, grids[ci], n_by, n_bx, ss, se, al)
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        w.pad()
        out += bytes(w.out)
    out += b"\xff\xd9"
    return bytes(out)


def _encode_dc_with_restarts(grids, comps_meta, cis, ah, al, mcus_x, mcus_y, dri):
    out = bytearray()
    w = _BitWriter()
    preds = {ci: 0 for ci in cis}
    rst = 0
    unit = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if unit and unit % dri == 0:
                w.pad()
                out += bytes(w.out) + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = _BitWriter()
                preds = {ci: 0 for ci in cis}
            for ci in cis:
                ch, cv = comps_meta[ci]
                for by in range(cv):
                    for bx in range(ch):
                        v = int(grids[ci][my * cv + by, mx * ch + bx, 0])
                        if ah == 0:
                            val = v >> al
                            diff = val - preds[ci]
                            preds[ci] = val
                            t = abs(diff).bit_length()
                            w.write(*_DC_ENC[t])
                            if t:
                                _sig_bits(w, diff, t)
                        else:
                            w.write((v >> al) & 1, 1)
            unit += 1
    w.pad()
    out += bytes(w.out)
    return bytes(out)


# --------------------------------------------------------------------------


def _rand_grid(rng, n_by, n_bx, density=0.2, dc_span=900, ac_span=120):
    g = np.zeros((n_by, n_bx, 64), dtype=np.int64)
    for by in range(n_by):
        for bx in range(n_bx):
            g[by, bx, 0] = rng.randint(-dc_span, dc_span + 1)
            nz = rng.choice(np.arange(1, 64), size=rng.randint(0, 13),
                            replace=False)
            for k in nz:
                if rng.rand() < density * 5:
                    v = 0
                    while v == 0:
                        v = rng.randint(-ac_span, ac_span + 1)
                    g[by, bx, k] = v
    return g


def _baseline_same_coeffs(width, height, comps, grids, qtab):
    """Encode identical coefficients through the (independently verified)
    baseline encoder for the differential check."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    blocks_per_comp = []
    for ci, (_cid, ch, cv) in enumerate(comps):
        blocks = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(ch):
                        blocks.append(grids[ci][my * cv + by, mx * ch + bx])
        blocks_per_comp.append(blocks)
    return _jpeg_encode(
        width, height,
        [(cid, ch, cv, 0) for cid, ch, cv in comps],
        blocks_per_comp, {0: qtab},
    )


_Q_VAR = (1 + (np.arange(64) * 7) % 17).astype(np.int64)


def test_spectral_selection_grayscale_matches_baseline():
    rng = np.random.RandomState(42)
    g = _rand_grid(rng, 2, 3)
    comps = [(1, 1, 1)]
    prog = _prog_jpeg(24, 16, comps, [g], _Q_VAR, [
        ("dc", [0], 0, 0),
        ("ac", 0, 1, 5, 0, 0),
        ("ac", 0, 6, 63, 0, 0),
    ])
    base = _baseline_same_coeffs(24, 16, comps, [g], _Q_VAR)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_successive_approximation_full_plan():
    rng = np.random.RandomState(7)
    g = _rand_grid(rng, 3, 2)
    comps = [(1, 1, 1)]
    prog = _prog_jpeg(16, 24, comps, [g], _Q_VAR, [
        ("dc", [0], 0, 2),
        ("ac", 0, 1, 10, 0, 2),
        ("ac", 0, 11, 63, 0, 2),
        ("dc", [0], 1, 1),
        ("ac", 0, 1, 10, 2, 1),
        ("ac", 0, 11, 63, 2, 1),
        ("dc", [0], 1, 0),
        ("ac", 0, 1, 10, 1, 0),
        ("ac", 0, 11, 63, 1, 0),
    ])
    base = _baseline_same_coeffs(16, 24, comps, [g], _Q_VAR)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_ycbcr_interleaved_dc_and_chroma_scans_skipped():
    rng = np.random.RandomState(11)
    comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    grids = [_rand_grid(rng, 2, 2) for _ in range(3)]
    prog = _prog_jpeg(16, 16, comps, grids, _Q_VAR, [
        ("dc", [0, 1, 2], 0, 1),
        ("ac", 0, 1, 63, 0, 1),
        ("ac", 1, 1, 63, 0, 1),  # chroma scans: decoder must skip these
        ("ac", 2, 1, 63, 0, 1),
        ("dc", [0, 1, 2], 1, 0),
        ("ac", 0, 1, 63, 1, 0),
        ("ac", 1, 1, 63, 1, 0),
        ("ac", 2, 1, 63, 1, 0),
    ])
    base = _baseline_same_coeffs(16, 16, comps, grids, _Q_VAR)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_420_subsampled_progressive():
    rng = np.random.RandomState(13)
    comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    grids = [_rand_grid(rng, 4, 4), _rand_grid(rng, 2, 2), _rand_grid(rng, 2, 2)]
    prog = _prog_jpeg(32, 32, comps, grids, _Q_VAR, [
        ("dc", [0, 1, 2], 0, 1),
        ("ac", 0, 1, 63, 0, 0),
        ("dc", [0, 1, 2], 1, 0),
    ])
    base = _baseline_same_coeffs(32, 32, comps, grids, _Q_VAR)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_eob_runs_across_sparse_blocks():
    # mostly-empty 6x6 blocks: long EOB runs with r > 0 and extra bits
    rng = np.random.RandomState(17)
    g = np.zeros((6, 6, 64), dtype=np.int64)
    g[0, 0, 0] = 100
    g[0, 0, 5] = 30
    g[3, 4, 7] = -44
    g[5, 5, 63] = 12
    comps = [(1, 1, 1)]
    prog = _prog_jpeg(48, 48, comps, [g], _Q_ONES, [
        ("dc", [0], 0, 0),
        ("ac", 0, 1, 63, 0, 0),
    ])
    base = _baseline_same_coeffs(48, 48, comps, [g], _Q_ONES)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_eob_runs_with_refinement_correction_bits():
    # refinement where EOB-covered blocks still carry history corrections
    rng = np.random.RandomState(19)
    g = _rand_grid(rng, 4, 2, ac_span=40)
    comps = [(1, 1, 1)]
    prog = _prog_jpeg(16, 32, comps, [g], _Q_ONES, [
        ("dc", [0], 0, 0),
        ("ac", 0, 1, 63, 0, 1),
        ("ac", 0, 1, 63, 1, 0),
    ])
    base = _baseline_same_coeffs(16, 32, comps, [g], _Q_ONES)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))


def test_progressive_dc_restart_interval():
    rng = np.random.RandomState(23)
    g = _rand_grid(rng, 2, 5)
    comps = [(1, 1, 1)]
    prog = _prog_jpeg(40, 16, comps, [g], _Q_VAR,
                      [("dc", [0], 0, 0), ("ac", 0, 1, 63, 0, 0)], dri=3)
    assert any(bytes([0xFF, 0xD0 + k]) in prog for k in range(8))
    base = _baseline_same_coeffs(40, 16, comps, [g], _Q_VAR)
    np.testing.assert_array_equal(decode_jpeg_luma(prog), decode_jpeg_luma(base))
