"""ZIP central-directory walking (multimodal.py): stdlib cross-validation
and the error gates (EOCD scan, signatures, CRC, method)."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from aci_export_spark import multimodal as MM


@pytest.mark.parametrize("doc_id", [0, 3, 6])
@pytest.mark.parametrize("byte_len", [0, 57, 200])
def test_agrees_with_stdlib_reader(doc_id, byte_len):
    data = MM.synth_zip(doc_id, byte_len)
    ours = MM.parse_zip_entries(data)
    zf = zipfile.ZipFile(io.BytesIO(data))
    infos = zf.infolist()
    assert [e["file_name"] for e in ours] == [i.filename for i in infos]
    assert [e["uncompressed_size"] for e in ours] == [i.file_size for i in infos]
    assert [e["local_offset"] for e in ours] == [i.header_offset for i in infos]
    for i in infos:
        zf.read(i)  # stdlib CRC pass


def test_missing_eocd_raises():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        MM.parse_zip_entries(b"PK\x03\x04" + bytes(60))


def test_crc_mismatch_raises():
    data = bytearray(MM.synth_zip(2, 57))
    # flip one byte of the FIRST entry's data (after its 30+7-byte header)
    data[37] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        MM.parse_zip_entries(bytes(data))


def test_compressed_method_gated():
    data = bytearray(MM.synth_zip(2, 0))
    # method field of the first central entry: EOCD cd_off + 10
    sig = struct.pack("<I", 0x06054B50)
    eocd = bytes(data).rfind(sig)
    cd_off = struct.unpack_from("<I", data, eocd + 16)[0]
    struct.pack_into("<H", data, cd_off + 10, 8)  # DEFLATE
    with pytest.raises(ValueError, match="method 8 gated"):
        MM.parse_zip_entries(bytes(data))


def test_bad_local_signature_raises():
    data = bytearray(MM.synth_zip(2, 0))
    data[0] ^= 0xFF  # corrupt the first local header signature
    with pytest.raises(ValueError, match="local-header signature"):
        MM.parse_zip_entries(bytes(data))


def test_comment_tolerant_backward_scan():
    # doc_id 6 -> 6-byte comment; the EOCD is NOT at len-22
    data = MM.synth_zip(6, 57)
    assert MM.parse_zip_entries(data)  # scan still finds it
