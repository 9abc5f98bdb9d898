"""MP4 sample-table parsing (multimodal.parse_mp4_tracks): round-trips
against the deterministic synthesizer, the uniform-stsz and mdhd-v1
branches, and the raise-on-malformed contract (truncated boxes, stts/stsz
disagreement, bad stsc coverage, non-monotonic stsc, missing tables)."""

from __future__ import annotations

import struct

import pytest

from aci_export_spark.multimodal import (
    _mp4_box,
    parse_mp4_tracks,
    synth_mp4,
)


def _replay(doc_id: int, byte_len: int, track_id: int) -> dict:
    ts = 600 * track_id + (byte_len % 5) * 120
    n = 16 + (byte_len + 31 * track_id) % 97
    d1 = 100 + byte_len % 11
    n1 = n // 2
    dur = n1 * d1 + (n - n1) * (d1 + 50)
    tb = sum(200 + (doc_id + i * track_id) % 800 for i in range(n))
    return {
        "track_id": track_id,
        "handler": "vide" if track_id == 1 else "soun",
        "timescale": ts,
        "n_samples": n,
        "duration_ticks": dur,
        "duration_ms": dur * 1000 // ts,
        "total_bytes": tb,
        "avg_bitrate_bps": tb * 8 * ts // dur,
        "n_chunks": -(-n // 10),
    }


@pytest.mark.parametrize(
    "doc_id,byte_len", [(0, 50), (1, 123), (7, 9999), (42, 1), (13, 97)]
)
def test_synth_roundtrip(doc_id, byte_len):
    tracks = parse_mp4_tracks(synth_mp4(doc_id, byte_len))
    want = [_replay(doc_id, byte_len, t) for t in ((1, 2) if doc_id % 2 else (1,))]
    assert tracks == want


def test_co64_path_used_for_audio_track():
    data = synth_mp4(3, 77)  # odd: has track 2 with co64 offsets
    assert b"co64" in data and b"stco" in data
    assert len(parse_mp4_tracks(data)) == 2


def _minimal_trak(stts_entries, stsz, stsc_entries, offsets, timescale=600,
                  duration=None, mdhd_v1=False):
    """Build a single-trak MP4 from explicit sample tables."""
    if duration is None:
        duration = sum(c * d for c, d in stts_entries)
    tkhd = (
        struct.pack(">I", 0) + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
        + struct.pack(">II", 0, 0)
    )
    if mdhd_v1:
        mdhd = (
            b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", timescale) + struct.pack(">Q", duration)
            + struct.pack(">HH", 0x55C4, 0)
        )
    else:
        mdhd = struct.pack(
            ">IIIIIHH", 0, 0, 0, timescale, duration, 0x55C4, 0
        )
    hdlr = struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12 + b"t\x00"
    stts = struct.pack(">II", 0, len(stts_entries)) + b"".join(
        struct.pack(">II", c, d) for c, d in stts_entries
    )
    if isinstance(stsz, tuple):  # (uniform_size, count)
        stsz_b = struct.pack(">III", 0, stsz[0], stsz[1])
    else:
        stsz_b = struct.pack(">III", 0, 0, len(stsz)) + struct.pack(
            f">{len(stsz)}I", *stsz
        )
    stsc = struct.pack(">II", 0, len(stsc_entries)) + b"".join(
        struct.pack(">III", f, s, 1) for f, s in stsc_entries
    )
    stco = struct.pack(">II", 0, len(offsets)) + struct.pack(
        f">{len(offsets)}I", *offsets
    )
    stbl = (
        _mp4_box(b"stts", stts) + _mp4_box(b"stsz", stsz_b)
        + _mp4_box(b"stsc", stsc) + _mp4_box(b"stco", stco)
    )
    mdia = (
        _mp4_box(b"mdhd", mdhd) + _mp4_box(b"hdlr", hdlr)
        + _mp4_box(b"minf", _mp4_box(b"stbl", stbl))
    )
    trak = _mp4_box(b"tkhd", tkhd) + _mp4_box(b"mdia", mdia)
    mvhd = struct.pack(">IIIII", 0, 0, 0, 1000, 0) + b"\x00" * 80
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", trak))
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    return ftyp + moov


def test_uniform_stsz_and_mdhd_v1():
    data = _minimal_trak(
        [(4, 25)], (300, 4), [(1, 2)], [64, 664], mdhd_v1=True
    )
    (t,) = parse_mp4_tracks(data)
    assert t["n_samples"] == 4
    assert t["total_bytes"] == 1200
    assert t["duration_ticks"] == 100
    assert t["n_chunks"] == 2


def test_stts_stsz_disagreement_raises():
    data = _minimal_trak([(5, 25)], (300, 4), [(1, 2)], [64, 664])
    with pytest.raises(ValueError, match="stts/stsz disagree"):
        parse_mp4_tracks(data)


def test_stsc_coverage_mismatch_raises():
    data = _minimal_trak([(4, 25)], (300, 4), [(1, 3)], [64, 964])
    with pytest.raises(ValueError, match="stsc covers"):
        parse_mp4_tracks(data)


def test_stsc_non_increasing_raises():
    data = _minimal_trak([(4, 25)], (300, 4), [(2, 2), (1, 2)], [64, 664])
    with pytest.raises(ValueError, match="out of range|increasing"):
        parse_mp4_tracks(data)


def test_truncated_stts_raises():
    data = synth_mp4(2, 64)
    i = data.index(b"stts")
    bad = bytearray(data)
    # inflate the declared entry count beyond the box payload
    (n,) = struct.unpack(">I", data[i + 8 : i + 12])
    bad[i + 8 : i + 12] = struct.pack(">I", n + 100)
    with pytest.raises(ValueError, match="truncated MP4 stts"):
        parse_mp4_tracks(bytes(bad))


def test_mdhd_duration_mismatch_raises():
    data = _minimal_trak([(4, 25)], (300, 4), [(1, 2)], [64, 664], duration=999)
    with pytest.raises(ValueError, match="mdhd duration"):
        parse_mp4_tracks(data)


def test_missing_tables_and_non_mp4_raise():
    with pytest.raises(ValueError, match="no ftyp"):
        parse_mp4_tracks(b"\x00" * 32)
    # moov/trak without an stbl: missing stts/stsz
    tkhd = (
        struct.pack(">I", 0) + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", 0) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
        + struct.pack(">II", 0, 0)
    )
    trak = _mp4_box(b"tkhd", tkhd)
    mvhd = struct.pack(">IIIII", 0, 0, 0, 1000, 0) + b"\x00" * 80
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", trak))
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    with pytest.raises(ValueError, match="missing stts"):
        parse_mp4_tracks(ftyp + moov)


def test_sample_offsets_anchor_to_scattered_chunks():
    """Chunk offsets that are NOT contiguous (mdat interleaved with other
    data) must anchor each chunk's samples at its stco entry — a cumsum
    over sizes would get every post-gap offset wrong."""
    from aci_export_spark.multimodal import mp4_sample_offsets

    # 5 samples of 100 bytes in chunks of 2 (last chunk 1): offsets leave
    # large gaps between chunks
    data = _minimal_trak(
        [(5, 25)], (100, 5), [(1, 2), (3, 1)], [1000, 5000, 9000]
    )
    rows = mp4_sample_offsets(data)
    got = [(r["sample_no"], r["chunk_no"], r["offset"], r["size"]) for r in rows]
    assert got == [
        (1, 1, 1000, 100),
        (2, 1, 1100, 100),
        (3, 2, 5000, 100),
        (4, 2, 5100, 100),
        (5, 3, 9000, 100),
    ]


def test_sample_offsets_roundtrip_synth():
    from aci_export_spark.multimodal import mp4_sample_offsets

    all_rows = mp4_sample_offsets(synth_mp4(13, 97))
    for t in (1, 2):  # odd doc_id → video + audio tracks
        rows = [r for r in all_rows if r["track_id"] == t]
        n = 16 + (97 + 31 * t) % 97
        assert [r["sample_no"] for r in rows] == list(range(1, n + 1))
        pos = 4096 * t
        for i, r in enumerate(rows):
            assert r["size"] == 200 + (13 + i * t) % 800
            assert r["offset"] == pos
            pos += r["size"]


def test_missing_tkhd_raises_in_both_parsers():
    """A trak with sample tables but no tkhd must raise ValueError from
    BOTH parsers (silent track_id=None rows / TypeError were the r9
    review finding)."""
    from aci_export_spark.multimodal import mp4_sample_offsets

    full = _minimal_trak([(4, 25)], (300, 4), [(1, 2)], [64, 664])
    # strip the tkhd box out of the trak
    i = full.index(b"tkhd") - 4
    size = struct.unpack(">I", full[i : i + 4])[0]
    stripped = full[:i] + full[i + size :]
    # fix up the enclosing trak and moov box sizes
    out = bytearray(stripped)
    for btype in (b"moov", b"trak"):
        j = out.index(btype) - 4
        old = struct.unpack(">I", out[j : j + 4])[0]
        out[j : j + 4] = struct.pack(">I", old - size)
    data = bytes(out)
    with pytest.raises(ValueError, match="missing tkhd"):
        parse_mp4_tracks(data)
    with pytest.raises(ValueError, match="missing tkhd"):
        mp4_sample_offsets(data)
