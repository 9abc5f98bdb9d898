"""Properties of the content-defined chunking operator: exact coverage,
determinism vs the pure-Python reference, and edit-robustness (an insertion
only changes chunks at/after the edit point within one boundary)."""

from __future__ import annotations

import hashlib

from aci_export_spark.llm.text import _cdc_chunks, cdc_fingerprints
from aci_export_spark.sources import read_table
from tests.conftest import SF_SMOKE


def test_chunks_cover_document_exactly(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(40)
    rows = cdc_fingerprints(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, chunks in by_doc.items():
        data = texts[doc_id].encode("utf-8")
        chunks.sort(key=lambda r: r["chunk_no"])
        pos = 0
        for c in chunks:
            assert c["chunk_offset"] == pos
            pos += c["chunk_len"]
            assert (
                c["chunk_fingerprint"]
                == hashlib.md5(data[c["chunk_offset"] : pos]).hexdigest()
            )
        assert pos == len(data)  # chunks tile the document exactly


def test_insertion_is_locally_contained():
    import random
    from collections import Counter

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(4000))
    edited = base[:2000] + b"EDIT!" + base[2000:]
    fp = lambda d: [hashlib.md5(d[o : o + n]).hexdigest() for o, n in _cdc_chunks(d)]
    a, b = fp(base), fp(edited)
    shared = Counter(a) & Counter(b)
    # boundaries realign at the first content-defined cut past the edit, so
    # only the handful of chunks around byte 2000 change — fixed-size blocks
    # would share nothing after the insertion point
    assert sum(shared.values()) >= len(a) - 4, (len(a), sum(shared.values()))
    # and chunks strictly before the edit are bit-identical in order
    prefix = 0
    while prefix < min(len(a), len(b)) and a[prefix] == b[prefix]:
        prefix += 1
    assert prefix >= 1
