"""TAR ustar and gzip stored-deflate parsers: round-trip property tests,
independent stdlib reader agreement, and the corruption matrices."""

from __future__ import annotations

import gzip
import io
import struct
import tarfile
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark import multimodal as MM


# ---------------------------------------------------------------------------
# TAR
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_tar_roundtrip(doc_id: int, byte_len: int) -> None:
    entries = MM.parse_tar_entries(MM.synth_tar(doc_id, byte_len))
    assert len(entries) == 1 + byte_len % 4
    for k, e in enumerate(entries):
        assert e["file_name"] == f"d{doc_id}/f{k}.txt"
        assert e["size"] == 10 + (doc_id * 13 + k * 101) % 1500
        assert e["mtime"] == 1_700_000_000 + doc_id * 37 + k
        assert e["n_blocks"] == 1 + (e["size"] + 511) // 512


def test_tar_stdlib_agreement() -> None:
    raw = MM.synth_tar(7, 123)
    tf = tarfile.open(fileobj=io.BytesIO(raw))
    members = tf.getmembers()
    ours = MM.parse_tar_entries(raw)
    assert [m.name for m in members] == [e["file_name"] for e in ours]
    assert [m.size for m in members] == [e["size"] for e in ours]
    assert [m.mtime for m in members] == [e["mtime"] for e in ours]


def test_tar_checksum_detects_corruption() -> None:
    raw = bytearray(MM.synth_tar(3, 100))
    raw[0] ^= 0x01  # flip a name byte; checksum no longer matches
    with pytest.raises(ValueError, match="checksum"):
        MM.parse_tar_entries(bytes(raw))


def test_tar_octal_enforced() -> None:
    raw = bytearray(MM.synth_tar(3, 100))
    raw[124] = ord("9")  # size field must be octal digits only
    # re-stamp the checksum so the octal check (not the checksum) fires
    block = raw[:512]
    block[148:156] = b" " * 8
    raw[148:156] = f"{sum(block):06o}\x00 ".encode()
    with pytest.raises(ValueError, match="octal"):
        MM.parse_tar_entries(bytes(raw))


def test_tar_missing_terminator() -> None:
    raw = MM.synth_tar(3, 100)
    with pytest.raises(ValueError, match="terminator|truncated"):
        MM.parse_tar_entries(raw[:-512])


def test_tar_truncated_body() -> None:
    raw = MM.synth_tar(3, 100)
    first_size = MM.parse_tar_entries(raw)[0]["size"]
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_tar_entries(raw[: 512 + first_size - 1])


# ---------------------------------------------------------------------------
# gzip
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_gzip_roundtrip(doc_id: int, byte_len: int) -> None:
    m = MM.parse_gzip_member(MM.synth_gzip(doc_id, byte_len))
    assert m["file_name"] == f"doc{doc_id}.bin"
    assert m["mtime"] == 1_700_000_000 + doc_id
    assert m["n_blocks"] == 1 + doc_id % 3
    assert m["payload_len"] == 20 + (doc_id * 11 + byte_len) % 900


def test_gzip_stdlib_agreement() -> None:
    raw = MM.synth_gzip(9, 321)
    payload = gzip.decompress(raw)
    m = MM.parse_gzip_member(raw)
    assert len(payload) == m["payload_len"]
    assert zlib.crc32(payload) == m["crc32"]


def test_gzip_len_nlen_mismatch() -> None:
    raw = bytearray(MM.synth_gzip(0, 10))  # one stored block
    i = raw.index(b"doc0.bin\x00") + len(b"doc0.bin\x00")
    # corrupt NLEN of the first block
    raw[i + 3] ^= 0xFF
    with pytest.raises(ValueError, match="LEN/NLEN"):
        MM.parse_gzip_member(bytes(raw))


def test_gzip_crc_trailer_detects_corruption() -> None:
    raw = bytearray(MM.synth_gzip(0, 10))
    i = raw.index(b"doc0.bin\x00") + len(b"doc0.bin\x00") + 5
    raw[i] ^= 0xFF  # flip a payload byte; block framing intact
    with pytest.raises(ValueError, match="CRC32"):
        MM.parse_gzip_member(bytes(raw))


def test_gzip_isize_checked() -> None:
    raw = bytearray(MM.synth_gzip(0, 10))
    struct.pack_into("<I", raw, len(raw) - 4,
                     struct.unpack_from("<I", raw, len(raw) - 4)[0] + 1)
    with pytest.raises(ValueError, match="ISIZE"):
        MM.parse_gzip_member(bytes(raw))


def test_gzip_huffman_blocks_are_gated() -> None:
    real = gzip.compress(b"x" * 100)  # stdlib emits Huffman blocks
    with pytest.raises(NotImplementedError, match="codec-gated"):
        MM.parse_gzip_member(real)


def test_gzip_trailing_garbage() -> None:
    raw = MM.synth_gzip(0, 10) + b"\x00"
    with pytest.raises(ValueError, match="trailing garbage"):
        MM.parse_gzip_member(raw)
