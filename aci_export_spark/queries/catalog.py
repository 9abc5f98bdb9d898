"""Table catalog for the ACI-domain query library.

A catalog is just `dict[str, DataFrame]` — parquet fixtures in tests, JDBC
scans in production (same shape the reference got from its MySQL pool,
`ddb/src/lib.rs:21-33`). Keeping it a plain dict keeps every query function
pure and source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ACI_TABLES = (
    "users",
    "member_search",
    "membership_paragraphs",
    "clubs",
    "regions",
    "taxonomy",
    "leadership",
    "addresses",
    "brns",
    "brn_numbers",
    "airstreams",
    "mailchimp_audience",
    "merge_field_defs",
    "remote_merge_fields",
    "user_roles",
    "microsite_links",
)


def load_catalog(spark: SparkSession, base_dir: str, tables=ACI_TABLES) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{base_dir}/{t}.parquet") for t in tables}
