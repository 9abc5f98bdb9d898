"""MP3 frame-header walking (multimodal.py): frame-length arithmetic,
ID3v2 skip, VBR detection, and desync gates."""

from __future__ import annotations

import pytest

from aci_export_spark import multimodal as MM


def _frame(bidx: int, sidx: int, pad: int) -> bytes:
    br = MM._MP3_BITRATES[bidx] * 1000
    sr = MM._MP3_RATES[sidx]
    flen = 144 * br // sr + pad
    return bytes([0xFF, 0xFB, (bidx << 4) | (sidx << 2) | (pad << 1), 0]) + bytes(
        flen - 4
    )


def test_hand_built_cbr_stream():
    data = _frame(9, 0, 0) + _frame(9, 0, 1) + _frame(9, 0, 0)
    info = MM.parse_mp3_frames(data)
    assert info["n_frames"] == 3
    assert info["bitrate_kbps"] == 128
    assert info["sample_rate"] == 44100
    assert info["duration_ms"] == 3 * 1152 * 1000 // 44100


def test_vbr_reports_minus_one():
    data = _frame(9, 0, 0) + _frame(14, 0, 0)
    assert MM.parse_mp3_frames(data)["bitrate_kbps"] == -1


def test_id3_tag_skipped():
    body = bytes(200)
    tag = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + body
    data = tag + _frame(5, 1, 0)
    info = MM.parse_mp3_frames(data)
    assert info["n_frames"] == 1 and info["sample_rate"] == 48000


def test_lost_sync_raises():
    data = _frame(9, 0, 0) + b"\x00garbage"
    with pytest.raises(ValueError, match="lost sync"):
        MM.parse_mp3_frames(data)


def test_free_bitrate_and_reserved_rate_raise():
    with pytest.raises(ValueError, match="bitrate index"):
        MM.parse_mp3_frames(bytes([0xFF, 0xFB, 0x00, 0]) + bytes(100))
    with pytest.raises(ValueError, match="reserved samplerate"):
        MM.parse_mp3_frames(bytes([0xFF, 0xFB, (9 << 4) | (3 << 2), 0]) + bytes(100))


def test_truncated_frame_raises():
    data = _frame(9, 0, 0)
    with pytest.raises(ValueError, match="truncated frame"):
        MM.parse_mp3_frames(data[:-10])


def test_samplerate_change_raises():
    with pytest.raises(ValueError, match="samplerate changed"):
        MM.parse_mp3_frames(_frame(9, 0, 0) + _frame(9, 1, 0))
