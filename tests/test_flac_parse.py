"""FLAC STREAMINFO parsing (multimodal.py): bit-packed field decode,
block-chain walking, and error gates."""

from __future__ import annotations

import pytest

from aci_export_spark import multimodal as MM


def test_known_bit_packing():
    # Hand-build STREAMINFO for 44100 Hz / 2ch / 16-bit / 1234567 samples
    # and assert the parser reads exactly those (independent of synth).
    sr, ch, bps, total = 44100, 2, 16, 1234567
    packed = ((sr & 0xFFFFF) << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    body = (
        (4096).to_bytes(2, "big") * 2
        + (14).to_bytes(3, "big")
        + (14).to_bytes(3, "big")
        + packed.to_bytes(8, "big")
        + bytes(16)
    )
    data = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    info = MM.parse_flac_streaminfo(data)
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 1234567
    assert info["duration_ms"] == 1234567 * 1000 // 44100


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        MM.parse_flac_streaminfo(b"OggS" + bytes(40))


def test_first_block_must_be_streaminfo():
    data = bytearray(MM.synth_flac(0, 0))
    data[4] = (data[4] & 0x80) | 0x04  # type -> VORBIS_COMMENT
    with pytest.raises(ValueError, match="not STREAMINFO"):
        MM.parse_flac_streaminfo(bytes(data))


def test_truncated_chain_raises():
    data = MM.synth_flac(0, 0)
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_flac_streaminfo(data[: 4 + 4 + 10])


def test_padding_block_is_walked():
    # synth emits STREAMINFO + PADDING(last); corrupt the last flag off the
    # padding header and the walk must hit the truncation gate instead of
    # looping forever
    data = bytearray(MM.synth_flac(3, 57))
    pad_hdr = 4 + 4 + 34
    assert data[pad_hdr] & 0x80
    data[pad_hdr] &= 0x7F
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_flac_streaminfo(bytes(data))
