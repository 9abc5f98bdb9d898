"""URL canonicalization (functions/text.py): normalization vectors for
every rule — case, default ports, fragments, tracking params, param
sorting, trailing slashes — plus idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from aci_export_spark.functions.text import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], schema="u string")
    rows = df.select(canonical_url(F.col("u")).alias("c")).collect()
    return [r["c"] for r in rows]


VECTORS = [
    # case + default https port
    ("HTTPS://WWW.Example.COM:443/Path", "https://www.example.com/Path"),
    # http default port; path case preserved
    ("http://Host.org:80/A/B", "http://host.org/A/B"),
    # non-default port kept
    ("https://h.io:8443/x", "https://h.io:8443/x"),
    # http with :443 kept (not its default)
    ("http://h.io:443/x", "http://h.io:443/x"),
    # fragment dropped
    ("https://a.b/c#section-2", "https://a.b/c"),
    # tracking params dropped, real ones kept and sorted
    (
        "https://a.b/c?utm_source=x&z=1&utm_medium=y&a=2",
        "https://a.b/c?a=2&z=1",
    ),
    ("https://a.b/c?ref=tw&id=5", "https://a.b/c?id=5"),
    ("https://a.b/c?fbclid=XYZ&gclid=Q", "https://a.b/c"),
    # 'ref' only as a whole param name: 'referrer=x' survives
    ("https://a.b/c?referrer=x", "https://a.b/c?referrer=x"),
    # trailing slash trimmed; root path becomes bare authority
    ("https://a.b/c/", "https://a.b/c"),
    ("https://a.b/", "https://a.b"),
    ("https://a.b", "https://a.b"),
    # query on root
    ("https://a.b/?id=1", "https://a.b?id=1"),
    # empty query → dropped
    ("https://a.b/c?", "https://a.b/c"),
    ("https://a.b/c?utm_only=1", "https://a.b/c"),
]


def test_canonicalization_vectors(spark):
    got = _canon(spark, [u for u, _ in VECTORS])
    for (u, want), g in zip(VECTORS, got):
        assert g == want, u


def test_canonicalization_idempotent(spark):
    once = _canon(spark, [u for u, _ in VECTORS])
    twice = _canon(spark, once)
    assert once == twice


def test_param_sort_is_bytewise(spark):
    got = _canon(spark, ["https://a.b/c?b=2&a=10&a=2"])
    assert got == ["https://a.b/c?a=10&a=2&b=2"]
