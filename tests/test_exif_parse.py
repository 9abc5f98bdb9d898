"""EXIF/APP1 decoder matrix: round-trips, byte orders, offset indirection,
marker-walk tolerance, and the documented ValueError surface."""

from __future__ import annotations

import struct

import pytest

from aci_export_spark.multimodal import parse_jpeg_exif, synth_jpeg_exif


@pytest.mark.parametrize("doc_id", range(1, 17))
def test_orientation_1_to_8_round_trip_both_byte_orders(doc_id):
    out = parse_jpeg_exif(synth_jpeg_exif(doc_id, byte_len=123))
    assert out["orientation"] == 1 + doc_id % 8
    assert out["make"] == f"Cam{doc_id % 5}"
    assert out["iso"] == 100 * (1 + doc_id % 32)
    assert out["pixel_x"] == 640 + 123 % 3000


def test_datetime_ascii_offset_indirection():
    out = parse_jpeg_exif(synth_jpeg_exif(7, byte_len=59))
    assert out["capture_dt"] == "2026:01:{:02d} {:02d}:{:02d}:{:02d}".format(
        1 + 59 % 28, 7 % 24, 59 % 60, (7 + 59) % 60
    )


def test_fill_bytes_before_app1_tolerated():
    data = synth_jpeg_exif(4, 50)
    padded = data[:2] + b"\xff\xff" + data[2:]
    assert parse_jpeg_exif(padded) == parse_jpeg_exif(data)


def test_app1_behind_other_segments_found():
    data = synth_jpeg_exif(3, 40)
    # insert an APP0/JFIF segment between SOI and APP1
    jfif = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    assert parse_jpeg_exif(data[:2] + jfif + data[2:]) == parse_jpeg_exif(data)


def test_missing_soi_raises():
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_exif(b"\x00\x01\x02\x03")


def test_no_app1_raises():
    with pytest.raises(ValueError, match="no APP1"):
        parse_jpeg_exif(b"\xff\xd8\xff\xd9")


def test_wrong_exif_header_raises():
    data = bytearray(synth_jpeg_exif(2, 30))
    i = data.index(b"Exif\x00\x00")
    data[i : i + 6] = b"Notif\x00"
    with pytest.raises(ValueError, match="no APP1"):
        parse_jpeg_exif(bytes(data))


def test_truncated_segment_raises():
    data = synth_jpeg_exif(5, 70)
    with pytest.raises(ValueError, match="truncated"):
        parse_jpeg_exif(data[: len(data) // 2])


def test_bad_tiff_magic_raises():
    data = bytearray(synth_jpeg_exif(6, 20))
    i = data.index(b"Exif\x00\x00") + 6
    data[i : i + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        parse_jpeg_exif(bytes(data))


def test_out_of_range_orientation_raises():
    data = bytearray(synth_jpeg_exif(2, 30))  # little-endian, orientation=3
    i = data.index(b"Exif\x00\x00") + 6
    # IFD0 entry 2 (orientation) value field: tiff+8 is IFD0, 2-byte count,
    # second entry at +2+12, value at +8
    val_at = i + 8 + 2 + 12 + 8
    assert struct.unpack_from("<H", data, val_at)[0] == 3
    struct.pack_into("<H", data, val_at, 9)
    with pytest.raises(ValueError, match="orientation"):
        parse_jpeg_exif(bytes(data))


def test_ascii_value_out_of_range_raises():
    data = bytearray(synth_jpeg_exif(2, 30))
    i = data.index(b"Exif\x00\x00") + 6
    # Make entry (first) value offset field → point past end of file
    off_at = i + 8 + 2 + 8
    struct.pack_into("<I", data, off_at, 1 << 20)
    with pytest.raises(ValueError, match="out of range"):
        parse_jpeg_exif(bytes(data))
