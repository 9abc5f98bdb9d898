"""WebVTT parser (multimodal.py): synthesis round-trip, the grammar
deltas vs SRT (header, optional identifiers, dot separators, optional
hours, settings, NOTE blocks), and the malformed matrix."""

from __future__ import annotations

import pytest

from aci_export_spark.multimodal import parse_webvtt_cues, synth_webvtt


def _replay(doc_id: int, byte_len: int):
    n = 1 + doc_id % 5
    t = 0
    cues = []
    for i in range(n):
        gap = (doc_id * 17 + i * 53) % 1200
        dur = 600 + (doc_id * 29 + i * 83) % 2200
        start = t + gap
        end = start + dur
        t = end
        nw = 2 + (byte_len + doc_id * 3 + i) % 8
        cues.append(
            {
                "cue_no": i + 1,
                "start_ms": start,
                "end_ms": end,
                "dur_ms": dur,
                "n_words": nw,
                "words_per_min": nw * 60000 // dur,
                "has_settings": i % 3 == 1,
            }
        )
    return cues


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 6, 9, 17, 100])
def test_webvtt_round_trip(doc_id):
    data = synth_webvtt(doc_id, byte_len=123 + doc_id)
    assert parse_webvtt_cues(data) == _replay(doc_id, 123 + doc_id)


def test_webvtt_header_forms():
    assert parse_webvtt_cues(b"WEBVTT\n\n00:00.000 --> 00:01.000\nhi\n")[0][
        "n_words"
    ] == 1
    assert parse_webvtt_cues(
        b"WEBVTT - with trailer\n\n00:00.000 --> 00:01.000\nhi\n"
    )
    with pytest.raises(ValueError, match="WEBVTT header"):
        parse_webvtt_cues(b"1\n00:00:00,000 --> 00:00:01,000\nsrt not vtt\n")


def test_webvtt_optional_identifier_and_settings():
    data = (
        b"WEBVTT\n\n"
        b"my id line\n00:02.000 --> 00:03.000 align:start position:10%\ntext here\n"
    )
    cues = parse_webvtt_cues(data)
    assert cues[0]["start_ms"] == 2000 and cues[0]["has_settings"]
    # identifier absent
    cues = parse_webvtt_cues(b"WEBVTT\n\n00:02.000 --> 00:03.000\ntext\n")
    assert not cues[0]["has_settings"]


def test_webvtt_hour_forms_equivalent():
    a = parse_webvtt_cues(b"WEBVTT\n\n00:00:02.500 --> 00:00:03.000\nx y\n")
    b = parse_webvtt_cues(b"WEBVTT\n\n00:02.500 --> 00:03.000\nx y\n")
    assert a[0]["start_ms"] == b[0]["start_ms"] == 2500


def test_webvtt_note_blocks_skipped():
    data = (
        b"WEBVTT\n\nNOTE\nthis is a comment\n\n"
        b"00:01.000 --> 00:02.000\nreal cue\n\n"
        b"NOTE inline comment\n\n"
        b"00:03.000 --> 00:04.000\nsecond\n"
    )
    cues = parse_webvtt_cues(data)
    assert [c["cue_no"] for c in cues] == [1, 2]


def test_webvtt_malformed_matrix():
    bad = [
        (b"WEBVTT\n\n00:02.00 --> 00:03.000\ntwo digit ms\n", "timestamp"),
        (b"WEBVTT\n\n00:61.000 --> 01:02.000\nbad minute\n", "timestamp"),
        (b"WEBVTT\n\n00:03.000 --> 00:02.000\nbackward\n", "duration"),
        (b"WEBVTT\n\n00:02.000 --> 00:02.000\nzero\n", "duration"),
        (b"WEBVTT\n\n00:02.000 --> 00:03.000\n\n", "no cues|empty|timestamp"),
        (b"WEBVTT\n\nonly an id line\nand text without timing\n", "timestamp"),
        (b"WEBVTT\n", "no cues"),
        (
            b"WEBVTT\n\n00:01.000 --> 00:05.000\na\n\n00:04.000 --> 00:06.000\nb\n",
            "overlaps",
        ),
    ]
    for data, pat in bad:
        with pytest.raises(ValueError, match=pat):
            parse_webvtt_cues(data)


def test_webvtt_crlf_tolerated():
    data = b"WEBVTT\r\n\r\n00:01.000 --> 00:02.000\r\nwords here\r\n"
    assert parse_webvtt_cues(data)[0]["n_words"] == 2
