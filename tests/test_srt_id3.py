"""SRT cue parsing and ID3v2.3 tag walking (multimodal.py): synthesis
round-trips, the CRLF / multi-line / encoding hazards, and loud failure on
malformed payloads."""

from __future__ import annotations

import pytest

from aci_export_spark.multimodal import (
    parse_id3_tags,
    parse_mp3_frames,
    parse_srt_cues,
    synth_id3_mp3,
    synth_srt,
)

# ---------------------------------------------------------------------------
# SRT
# ---------------------------------------------------------------------------


def test_srt_roundtrip_replays_synthesis_arithmetic():
    for doc_id, byte_len in [(0, 50), (1, 123), (5, 300), (11, 77)]:
        cues = parse_srt_cues(synth_srt(doc_id, byte_len))
        assert len(cues) == 1 + doc_id % 6
        t = 0
        for i, c in enumerate(cues):
            gap = (doc_id * 13 + i * 41) % 1500
            dur = 700 + (doc_id * 31 + i * 97) % 2500
            assert c["cue_no"] == i + 1
            assert c["start_ms"] == t + gap
            assert c["dur_ms"] == dur
            assert c["end_ms"] == c["start_ms"] + dur
            assert c["n_words"] == 2 + (byte_len + doc_id + i) % 9
            assert c["words_per_min"] == c["n_words"] * 60000 // dur
            t = c["end_ms"]


def test_srt_crlf_and_multiline_text_are_handled():
    # odd doc_id -> CRLF line endings; cue 0 (i % 3 == 0) splits two lines
    data = synth_srt(3, 100)
    assert b"\r\n" in data
    cues = parse_srt_cues(data)
    assert cues[0]["n_words"] == 2 + (100 + 3 + 0) % 9  # both lines counted


def test_srt_malformed_inputs_raise():
    ok = synth_srt(2, 60).decode()
    with pytest.raises(ValueError, match="malformed timestamp"):
        parse_srt_cues(ok.replace(" --> ", " -> ").encode())
    with pytest.raises(ValueError, match="out of sequence"):
        parse_srt_cues(ok.replace("1\n", "7\n", 1).encode())
    with pytest.raises(ValueError, match="no cues"):
        parse_srt_cues(b"   ")
    # overlapping cues: shift the second cue's start before the first's end
    two = (
        "1\n00:00:00,000 --> 00:00:02,000\nhello there\n\n"
        "2\n00:00:01,500 --> 00:00:03,000\nworld\n"
    )
    with pytest.raises(ValueError, match="overlaps"):
        parse_srt_cues(two.encode())
    back = "1\n00:00:02,000 --> 00:00:01,000\nx y\n"
    with pytest.raises(ValueError, match="non-positive duration"):
        parse_srt_cues(back.encode())


# ---------------------------------------------------------------------------
# ID3v2.3
# ---------------------------------------------------------------------------


def test_id3_roundtrip_both_encodings():
    for doc_id in (4, 7):  # latin-1 and UTF-16 variants
        tags = parse_id3_tags(synth_id3_mp3(doc_id, 90))
        by_id = {t["frame_id"]: t["value"] for t in tags}
        assert by_id == {
            "TIT2": f"Title {doc_id}",
            "TPE1": f"Artist {doc_id % 17}",
            "TALB": f"Album {doc_id % 7}",
            "TRCK": f"{1 + doc_id % 12}/12",
        }
        assert [t["frame_id"] for t in tags] == ["TIT2", "TPE1", "TALB", "TRCK"]


def test_id3_tagged_blob_is_still_a_valid_mp3():
    """The audio body after the tag walks as genuine CBR frames — the tag
    writer and the frame walker agree on where the tag ends."""
    info = parse_mp3_frames(synth_id3_mp3(7, 90))
    assert info["n_frames"] == 2 + 90 % 4
    assert info["bitrate_kbps"] == 128 and info["sample_rate"] == 44100


def test_id3_malformed_inputs_raise():
    good = bytearray(synth_id3_mp3(4, 90))
    with pytest.raises(ValueError, match="missing ID3v2"):
        parse_id3_tags(b"RIFF" + bytes(good[4:]))
    bad_ver = bytearray(good)
    bad_ver[3] = 4
    with pytest.raises(ValueError, match="unsupported version"):
        parse_id3_tags(bytes(bad_ver))
    # corrupt the first frame's size so it overruns the tag
    overrun = bytearray(good)
    overrun[14:18] = (1 << 20).to_bytes(4, "big")
    with pytest.raises(ValueError, match="overruns tag"):
        parse_id3_tags(bytes(overrun))
    # unknown text encoding byte
    bad_enc = bytearray(good)
    bad_enc[20] = 9  # first frame payload's encoding byte
    with pytest.raises(ValueError, match="unknown text encoding"):
        parse_id3_tags(bytes(bad_enc))


def test_id3_v23_frame_sizes_are_plain_big_endian():
    """A frame payload longer than 127 bytes distinguishes plain-BE from
    syncsafe size encoding (syncsafe would misread 0x0080 as 0x00)."""
    tags = parse_id3_tags(synth_id3_mp3(4, 90))
    assert len(tags) == 4  # parsed fine with plain-BE reader
    # hand-build a frame with size 200: syncsafe decoding would walk wrong
    val = "x" * 199
    payload = b"\x00" + val.encode("latin-1")
    body = b"TIT2" + len(payload).to_bytes(4, "big") + b"\x00\x00" + payload
    size = len(body)
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    data = b"ID3" + bytes([3, 0, 0]) + syncsafe + body
    got = parse_id3_tags(data)
    assert got == [{"frame_id": "TIT2", "value": val}]
