"""PDF classic-xref walk: round-trip property tests and the corruption
matrix — every object access goes through the xref table, so each framing
or cross-check failure must raise, never fall back to scanning."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from aci_export_spark import multimodal as MM


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 4000))
def test_pdf_roundtrip(doc_id: int, byte_len: int) -> None:
    pages = MM.parse_pdf_pages(MM.synth_pdf(doc_id, byte_len))
    assert len(pages) == 1 + doc_id % 3
    for p in pages:
        expected = f"pg{p['page_no']} doc{doc_id} len{byte_len}"
        assert p["text"] == expected
        assert p["page_obj"] == 3 + p["page_no"]
        assert p["content_len"] == 11 + len(expected)


def test_pdf_bad_header() -> None:
    data = b"%PNG" + MM.synth_pdf(1, 10)[4:]
    with pytest.raises(ValueError, match="header"):
        MM.parse_pdf_pages(data)


def test_pdf_corrupt_xref_offset() -> None:
    raw = bytearray(MM.synth_pdf(4, 100))
    i = raw.index(b"xref")
    j = raw.index(b"n \n", i) + 3  # start of the next in-use entry
    raw[j] = ord("9")
    with pytest.raises(ValueError, match="lands on garbage"):
        MM.parse_pdf_pages(bytes(raw))


def test_pdf_startxref_points_elsewhere() -> None:
    raw = MM.synth_pdf(4, 100)
    sx = raw.rindex(b"startxref")
    nl = raw.index(b"\n", sx)
    end = raw.index(b"\n", nl + 1)
    old = raw[nl + 1 : end]
    patched = raw[: nl + 1] + str(int(old) - 2).encode().rjust(len(old), b"0") + raw[end:]
    with pytest.raises(ValueError, match="does not point at an xref"):
        MM.parse_pdf_pages(patched)


def test_pdf_entry_framing_enforced() -> None:
    # shrink an entry to 19 bytes: every subsequent slice misframes
    raw = MM.synth_pdf(1, 10)
    i = raw.index(b"0000000000 65535 f \n")
    broken = raw[:i] + b"0000000000 65535 f\n" + raw[i + 20 :]
    with pytest.raises(ValueError, match="20-byte framed|kind|garbage"):
        MM.parse_pdf_pages(broken)


def test_pdf_count_kids_mismatch() -> None:
    raw = MM.synth_pdf(2, 100)  # 3 pages
    broken = raw.replace(b"/Count 3", b"/Count 2")
    with pytest.raises(ValueError, match="Count"):
        MM.parse_pdf_pages(broken)


def test_pdf_length_mismatch() -> None:
    raw = MM.synth_pdf(1, 10)  # 2 pages; patch first /Length up by one
    i = raw.index(b"/Length ")
    j = raw.index(b" >>", i)
    n = int(raw[i + 8 : j])
    broken = raw[:i] + f"/Length {n + 1}".encode() + raw[j:]
    with pytest.raises(ValueError, match="Length"):
        MM.parse_pdf_pages(broken)


def test_pdf_kids_array_validated() -> None:
    raw = MM.synth_pdf(0, 10)  # 1 page: /Kids [3 0 R]
    broken = raw.replace(b"/Kids [3 0 R]", b"/Kids [3 0 Q]")
    with pytest.raises(ValueError, match="Kids"):
        MM.parse_pdf_pages(broken)
