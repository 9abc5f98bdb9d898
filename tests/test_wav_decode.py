"""WAV PCM sample decode (multimodal.decode_wav_samples): round-trips on
synthesized real RIFF containers, 8-bit/stereo variants, alignment, and the
gate/error paths. The registered query mm_audio_stats carries the driver
oracle; these tests cover the decoder surface the query doesn't reach."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aci_export_spark.multimodal import (
    attach_audio,
    audio_stats,
    decode_wav_samples,
    parse_wav_meta,
    synth_wav,
    _WAV_A,
    _WAV_B,
    _WAV_N_BASE,
    _WAV_N_MOD,
)


def _wav(pcm: bytes, channels=1, sr=8000, bits=16, fmt_tag=1, extra=b""):
    block = max(1, channels * bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, sr, sr * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + extra
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_synth_wav_decodes_to_formula_samples():
    for doc_id, byte_len in ((0, 0), (7, 123), (99991, 5000)):
        data = synth_wav(doc_id, byte_len)
        smp, sr, ch = decode_wav_samples(data)
        n = _WAV_N_BASE + byte_len % _WAV_N_MOD
        i = np.arange(n, dtype=np.int64)
        expect = (doc_id * _WAV_A + i * _WAV_B) % 65536 - 32768
        np.testing.assert_array_equal(smp, expect)
        assert sr == 8000 + (byte_len % 37) * 1000
        assert ch == 1
        # and the metadata-only parser agrees on the same container
        dur_ms, sr2, ch2 = parse_wav_meta(data)
        assert (sr2, ch2) == (sr, 1)
        assert dur_ms == 2 * n * 1000 // (sr * 2)


def test_16bit_stereo_interleaved():
    frames = np.array([[-32768, 32767], [100, -100], [0, 512]], dtype="<i2")
    smp, sr, ch = decode_wav_samples(_wav(frames.tobytes(), channels=2, sr=44100))
    assert (sr, ch) == (44100, 2)
    np.testing.assert_array_equal(smp, frames.reshape(-1).astype(np.int32))


def test_8bit_unsigned_centered_and_shifted():
    raw = bytes([0, 128, 255, 64])
    smp, _, _ = decode_wav_samples(_wav(raw, bits=8))
    np.testing.assert_array_equal(smp, [(-128) << 8, 0, 127 << 8, (-64) << 8])


def test_odd_size_chunk_alignment_before_data():
    # an odd-size junk chunk must not derail the walk to `data`
    junk = b"cue " + struct.pack("<I", 3) + b"abc" + b"\x00"
    pcm = np.array([1, -2, 3], dtype="<i2").tobytes()
    smp, _, _ = decode_wav_samples(_wav(pcm, extra=junk))
    np.testing.assert_array_equal(smp, [1, -2, 3])


def test_float32_pcm_projects_to_int16_range():
    f = np.array([0.0, 1.0, -1.0, 0.5, 2.5, -2.5, 1e-4], dtype="<f4")
    smp, _, _ = decode_wav_samples(_wav(f.tobytes(), bits=32, fmt_tag=3))
    np.testing.assert_array_equal(
        smp, [0, 32767, -32767, 16384, 32767, -32767, 3]
    )
    f64 = np.array([0.25, -0.75], dtype="<f8")
    smp, _, _ = decode_wav_samples(_wav(f64.tobytes(), bits=64, fmt_tag=3))
    np.testing.assert_array_equal(smp, [8192, -24575])


def test_24_and_32_bit_pcm_high_bits_projection():
    # 24-bit LE frames: 0x123456 -> top 16 bits 0x1234; negative sign kept
    raw24 = bytes([0x56, 0x34, 0x12, 0x00, 0x00, 0x80, 0xFF, 0xFF, 0x7F])
    smp, _, _ = decode_wav_samples(_wav(raw24, bits=24))
    np.testing.assert_array_equal(smp, [0x1234, -32768, 32767])
    raw32 = np.array([0x12345678, -(1 << 31), (1 << 31) - 1], dtype="<i4")
    smp, _, _ = decode_wav_samples(_wav(raw32.tobytes(), bits=32))
    np.testing.assert_array_equal(smp, [0x1234, -32768, 32767])


def test_gates_and_errors():
    pcm = np.array([1], dtype="<i2").tobytes()
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav_samples(_wav(pcm, fmt_tag=2))  # ADPCM stays gated
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_wav_samples(_wav(b"\x00" * 6, bits=12))
    with pytest.raises(ValueError, match="float WAV with 16-bit"):
        decode_wav_samples(_wav(pcm, bits=16, fmt_tag=3))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_samples(b"OggS" + b"\x00" * 20)
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav_samples(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # data chunk declaring more bytes than present
    good = _wav(pcm)
    with pytest.raises(ValueError, match="truncated WAV data"):
        decode_wav_samples(good[:-1])


def test_audio_stats_spark_stage(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 300)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in audio_stats(attach_audio(docs)).collect()}
    assert set(rows) == {1, 2, 3}
    for doc_id, text in ((1, "hello world"), (2, ""), (3, "x" * 300)):
        b = len(text.encode())
        n = _WAV_N_BASE + b % _WAV_N_MOD
        i = np.arange(n, dtype=np.int64)
        smp = (doc_id * _WAV_A + i * _WAV_B) % 65536 - 32768
        r = rows[doc_id]
        assert r["n_samples"] == n
        assert r["peak_abs"] == int(np.abs(smp).max())
        assert r["sum_abs"] == int(np.abs(smp).sum())
        assert r["sum_sq"] == int((smp * smp).sum())
        assert r["silent_samples"] == int((np.abs(smp) < 512).sum())
        assert r["clipped_samples"] == int(((smp == -32768) | (smp == 32767)).sum())


def test_gated_synth_silence_runs_exact():
    """The gated envelope silences even 32-sample blocks; run detection
    must recover them exactly (plus any random |raw|<512 extensions,
    verified against a pure-python replay)."""
    import numpy as np

    from aci_export_spark.multimodal import (
        decode_wav_samples,
        synth_wav_gated,
    )

    for doc_id, byte_len in [(0, 50), (7, 123), (42, 9999)]:
        smp, sr, ch = decode_wav_samples(synth_wav_gated(doc_id, byte_len))
        n = 64 + byte_len % 193
        assert len(smp) == n and ch == 1
        i = np.arange(n, dtype=np.int64)
        want = ((doc_id * 2654435761 + i * 40503) % 65536 - 32768) * (
            (i // 32) % 2
        )
        assert np.array_equal(smp.astype(np.int64), want)
        # replay the run structure in pure python
        m = np.abs(want) < 512
        runs, cur = [], 0
        for v in m:
            if v:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        q = [r for r in runs if r >= 8]
        assert q, "every gated asset has at least one 32-sample block"
        assert max(q) >= 32


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law expansion (format tags 7 / 6)
# ---------------------------------------------------------------------------


def _ulaw_ref(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_ref(code: int) -> int:
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _g711_wav(codes: bytes, tag: int) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
        + (b"\x00" if len(codes) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_mulaw_all_codes_match_reference():
    from aci_export_spark.multimodal import decode_wav_samples

    codes = bytes(range(256))
    smp, sr, ch = decode_wav_samples(_g711_wav(codes, 7))
    assert (sr, ch) == (8000, 1) and len(smp) == 256
    assert [int(x) for x in smp] == [_ulaw_ref(c) for c in range(256)]
    # canonical anchors: 0xFF -> 0, 0x00 -> -32124, 0x80 -> +32124
    assert int(smp[0xFF]) == 0
    assert int(smp[0x00]) == -32124
    assert int(smp[0x80]) == 32124


def test_alaw_all_codes_match_reference():
    from aci_export_spark.multimodal import decode_wav_samples

    codes = bytes(range(256))
    smp, _, _ = decode_wav_samples(_g711_wav(codes, 6))
    assert [int(x) for x in smp] == [_alaw_ref(c) for c in range(256)]
    # canonical anchors: 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256, 0xAA -> +32256
    assert int(smp[0x55]) == -8
    assert int(smp[0xD5]) == 8
    assert int(smp[0x2A]) == -32256
    assert int(smp[0xAA]) == 32256


def test_adpcm_still_gated():
    import pytest

    from aci_export_spark.multimodal import decode_wav_samples

    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav_samples(_g711_wav(bytes(16), 2))
