"""Seventh-wave operators: WARC Content-Length framing (multimodal.py),
Avro OCF zigzag/sync handling (multimodal.py), and robots longest-match
semantics (functions/text.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aci_export_spark.multimodal import (
    _WARC_TRAP,
    _read_varint_zigzag,
    _zigzag_varint,
    parse_avro_ocf,
    parse_warc_records,
    synth_avro_ocf,
    synth_warc,
)


# ---------------------------------------------------------------------------
# WARC
# ---------------------------------------------------------------------------


def test_warc_round_trip_with_info():
    data = synth_warc(4, "src1", "en", "hello world " * 30)
    recs = parse_warc_records(data)
    assert [r["rec_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2]["http_status"] == 200
    assert recs[2]["body_bytes"] == 120 + len(_WARC_TRAP)
    assert recs[1]["target_uri"] == "https://www.src1.example.com/en/4"


def test_warc_round_trip_without_info():
    recs = parse_warc_records(synth_warc(5, "s", "fr", "court texte"))
    assert [r["rec_type"] for r in recs] == ["request", "response"]
    assert recs[1]["body_bytes"] == len("court texte") + len(_WARC_TRAP)


def test_warc_framing_trap_defeats_delimiter_scanning():
    """The response body CONTAINS a fake record boundary; Content-Length
    framing must sail past it, while a delimiter scanner would split the
    response early (asserted by showing the scan finds the lookalike
    INSIDE the response payload)."""
    data = synth_warc(1, "s", "de", "x " * 100)
    recs = parse_warc_records(data)
    assert len(recs) == 2  # strict framing: exactly request + response
    # the lookalike genuinely exists inside the record bytes a scanner
    # would have split on
    assert data.count(b"\r\n\r\nWARC/1.0") >= 1


def test_warc_malformed_matrix():
    good = synth_warc(2, "s", "en", "abc def")
    cases = [
        (b"WARX/1.0\r\n" + good[9:], "bad version"),
        (good[: len(good) - 4], "terminator|truncated"),
        (good.replace(b"Content-Length", b"X-Length", 1), "Content-Length"),
        (b"", "no records"),
    ]
    for data, pat in cases:
        with pytest.raises(ValueError, match=pat):
            parse_warc_records(data)


def test_warc_spark_query_shape(spark):
    from aci_export_spark.multimodal import attach_warc, warc_records

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = warc_records(attach_warc(docs)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, recs in by_doc.items():
        types = [r["rec_type"] for r in sorted(recs, key=lambda x: x["rec_no"])]
        want = (["warcinfo"] if d % 4 == 0 else []) + ["request", "response"]
        assert types == want, d


# ---------------------------------------------------------------------------
# Avro OCF
# ---------------------------------------------------------------------------


def test_zigzag_varint_round_trip():
    for n in [0, 1, -1, 2, -2, 5, 63, 64, -64, -65, 2**31, -(2**31), 2**62]:
        data = _zigzag_varint(n)
        got, i = _read_varint_zigzag(data, 0)
        assert (got, i) == (n, len(data)), n


def test_zigzag_is_not_plain_varint():
    # the classic bug: doc_id 5 read by a plain varint reader gives 10
    assert _zigzag_varint(5)[0] == 10


def test_avro_round_trip_counts():
    rows = [(i, "en" if i % 2 else "de") for i in range(40)]
    blob = synth_avro_ocf("srcX", rows)
    r = parse_avro_ocf(blob)
    assert r["n_records"] == 40
    assert r["n_blocks"] == 3  # ceil(40/16)
    assert r["sum_ids"] == sum(range(40))


def test_avro_sync_mismatch_raises():
    blob = bytearray(synth_avro_ocf("s", [(1, "en"), (2, "fr")]))
    blob[-1] ^= 0xFF  # corrupt the final block's sync marker
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_ocf(bytes(blob))


def test_avro_bad_magic_and_codec():
    with pytest.raises(ValueError, match="magic"):
        parse_avro_ocf(b"NOPE" + b"\x00" * 40)
    blob = synth_avro_ocf("s", [(1, "en")])
    with pytest.raises(ValueError, match="codec"):
        parse_avro_ocf(blob.replace(b"null", b"snap", 1))


def test_avro_sync_marker_is_source_derived():
    blob = synth_avro_ocf("abc", [(1, "en")])
    assert hashlib.md5(b"avro:abc").digest() in blob


# ---------------------------------------------------------------------------
# robots longest-match
# ---------------------------------------------------------------------------


def _robots(spark, paths):
    from aci_export_spark.functions.text import robots_longest_match

    urls = spark.createDataFrame(
        [(i, p) for i, p in enumerate(paths)], schema="id long, path string"
    )
    rules = spark.createDataFrame(
        [("/de/", False), ("/de/4", True), ("/zh/7", False), ("/", True)],
        schema="rule_path string, allow boolean",
    )
    out = robots_longest_match(urls, rules, path_col="path").collect()
    return {r["path"]: (r["allowed"], r["matched_rule"]) for r in out}


def test_robots_longest_match_semantics(spark):
    got = _robots(
        spark,
        ["/de/4", "/de/42", "/de/5", "/zh/7", "/zh/70", "/zh/8", "/en/1"],
    )
    # /de/4 and /de/42 hit the LONGER allow rule over the /de/ disallow
    assert got["/de/4"] == (True, "/de/4")
    assert got["/de/42"] == (True, "/de/4")
    # other /de/ paths: the disallow wins over the 1-char allow-all
    assert got["/de/5"] == (False, "/de/")
    # /zh/7 is a PREFIX rule: matches /zh/70 too
    assert got["/zh/7"] == (False, "/zh/7")
    assert got["/zh/70"] == (False, "/zh/7")
    assert got["/zh/8"] == (True, "/")
    assert got["/en/1"] == (True, "/")


def test_robots_no_match_defaults_allowed(spark):
    from aci_export_spark.functions.text import robots_longest_match

    urls = spark.createDataFrame([(1, "/x")], schema="id long, path string")
    rules = spark.createDataFrame(
        [("/y/", False)], schema="rule_path string, allow boolean"
    )
    r = robots_longest_match(urls, rules, path_col="path").collect()[0]
    assert r["allowed"] is True and r["matched_rule"] is None


def test_robots_duplicate_rows_stay_duplicated(spark):
    """Row-per-row contract (r10 advice): byte-identical input rows must
    each produce an output row — the argmax partitions on row identity,
    not row content."""
    from aci_export_spark.functions.text import robots_longest_match

    urls = spark.createDataFrame(
        [("/de/4",), ("/de/4",), ("/de/5",)], schema="path string"
    )
    rules = spark.createDataFrame(
        [("/de/", False), ("/de/4", True)],
        schema="rule_path string, allow boolean",
    )
    out = robots_longest_match(urls, rules, path_col="path").collect()
    assert len(out) == 3
    assert sorted((r["path"], r["allowed"]) for r in out) == [
        ("/de/4", True),
        ("/de/4", True),
        ("/de/5", False),
    ]


def test_robots_equal_length_tie_allow_wins(spark):
    from aci_export_spark.functions.text import robots_longest_match

    urls = spark.createDataFrame([(1, "/a/b")], schema="id long, path string")
    rules = spark.createDataFrame(
        [("/a/b", False), ("/a/b", True)],
        schema="rule_path string, allow boolean",
    )
    r = robots_longest_match(urls, rules, path_col="path").collect()[0]
    assert r["allowed"] is True
