"""Text expressions: validity filters, CSV splitting, tokenization, n-grams.

The first half re-expresses reference scalar ops (F9, F10; SURVEY.md §2.8);
the second half is the text layer the beyond-reference pipeline operators
(dedup / language-id / quality scoring, `aci_export_spark.llm`) build on.
Everything is a Column expression — tokenization of a 100 TB corpus must not
cross into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Word-ish tokens: runs of letters/digits/apostrophes. BPE-ish enough for
#: counting; stays in the JVM regex engine.
TOKEN_PATTERN = r"[A-Za-z0-9']+"


def valid_email(email: Column) -> Column:
    """Reference P9/F10 (`mailchimp/src/members.rs:111-114`): non-null,
    non-empty, not a placeholder domain."""
    e = F.lower(F.trim(email))
    return (
        email.isNotNull()
        & (e != "")
        & ~e.endswith("noemail.com")
        & ~e.endswith("example.com")
    )


def split_csv_trim(csv: Column) -> Column:
    """CSV string → array<string>, each element trimmed; empty/NULL → empty array.

    Reference F9 (`ddb/src/members.rs:1050-1058`): brns CSV from the `v_brns`
    view split and trimmed client-side.
    """
    arr = F.split(csv, ",")
    trimmed = F.transform(arr, lambda x: F.trim(x))
    cleaned = F.filter(trimmed, lambda x: x != "")
    return F.when(csv.isNull(), F.array().cast("array<string>")).otherwise(cleaned)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse whitespace,
    strip leading/trailing space. Deterministic and cheap (JVM regex)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """array<string> of word tokens (JVM-side regexp extraction)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column) -> Column:
    """Whitespace-delimited token count; 0 for empty/NULL."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """array<string> of character n-grams (shingles) over the normalized text.

    PERFORMANCE CAVEAT: the lambda captures the normalized-string expression,
    and after projection collapse that expression re-evaluates per element —
    O(len²) per document. Pass an already-materialized/cheap column, or for
    corpus-scale shingling use the row-exploded form
    (`aci_export_spark.llm.dedup.shingle_rows`), whose per-row substr runs on
    a bound attribute.
    """
    norm = normalize_text(text)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(norm) - n, F.lit(0))),
        lambda i: norm.substr(i + 1, F.lit(n)),
    )


def canonical_url(url: Column) -> Column:
    """Canonical URL for crawl/document dedup — the normalization step every
    web-corpus pipeline runs before URL-level dedup (CommonCrawl dedups on
    normalized URL before any content hash):

    - scheme and host lowercased;
    - default ports stripped (``:443`` for https, ``:80`` for http);
    - fragment dropped;
    - tracking query params dropped (``utm_*``, ``ref``, ``fbclid``,
      ``gclid``);
    - surviving params sorted bytewise;
    - trailing path slash trimmed (root kept as bare authority).

    Pure JVM Column expressions (regexp + split + array ops) — the DuckDB
    oracle re-expresses the same normalization over its own string/list
    functions, so agreement exercises two independent implementations.
    """
    defrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(defrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(defrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = F.when(
        scheme == "https", F.regexp_replace(authority, r":443$", "")
    ).otherwise(
        F.when(scheme == "http", F.regexp_replace(authority, r":80$", "")).otherwise(
            authority
        )
    )
    path = F.regexp_extract(after, r"^[^/?]*(/[^?]*)?", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(after, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.rlike("^(ref|fbclid|gclid)="),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def robots_longest_match(
    urls: "DataFrame",
    rules: "DataFrame",
    path_col: str = "path",
) -> "DataFrame":
    """Robots-exclusion decision per URL path under the REP longest-match
    rule (RFC 9309 §2.2.2: the most specific — longest — matching path
    wins; on an allow/disallow tie of equal length, allow wins).  Rule
    paths are literal prefixes (the RFC's core semantics; ``*``/``$``
    wildcards are a documented non-goal of this subset).

    ``rules`` is (rule_path string, allow boolean) — a robots.txt is
    definitionally tiny and bounded, so the match join broadcasts it and
    the non-equi prefix condition is a rules-bounded nested loop (≤ rules
    comparisons per URL — the right plan at ANY corpus scale).  URLs
    matching no rule are allowed (the RFC default).  Output: every input
    column plus ``allowed`` and ``matched_rule`` (NULL when no rule
    matched) — strictly row-per-row: the longest-match argmax partitions
    on an internal per-row id assigned BEFORE the rule join, so two
    byte-identical input rows stay two output rows (r10 advice: the
    previous partition-by-all-columns silently deduplicated them)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    r = rules.select(
        F.col("rule_path").alias("__rp"), F.col("allow").alias("__allow")
    )
    with_id = urls.withColumn("__row_id", F.monotonically_increasing_id())
    matched = with_id.join(
        broadcast(r), F.col(path_col).startswith(F.col("__rp")), "left"
    )
    # partition by the pre-join row id — row identity, not row content, so
    # duplicate input rows each keep their own longest-match survivor
    w = Window.partitionBy("__row_id").orderBy(
        F.length("__rp").desc(), F.col("__allow").desc(), F.col("__rp").asc()
    )
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(c) for c in urls.columns],
            F.coalesce(F.col("__allow"), F.lit(True)).alias("allowed"),
            F.col("__rp").alias("matched_rule"),
        )
    )
