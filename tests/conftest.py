"""Shared pytest fixtures: one session-scoped SparkSession, DuckDB oracle
connection with the driver's view-registration convention."""

from __future__ import annotations

import duckdb
import pytest

from aci_export_spark.session import get_spark
from aci_export_spark.sources import TEST_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aci-export-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection mirroring the driver: each test table registered as a
    view named after the table."""
    con = duckdb.connect()

    def bind(sf_dir: str):
        for t in TEST_TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    yield bind
