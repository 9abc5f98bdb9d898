"""The correctness gate, locally: every registered query must hash-match its
DuckDB oracle at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import pytest

from aci_export_spark import harness
from tests.conftest import SF_CORRECT
from tests.oracle_compare import compare

harness._ensure_all_registered()


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = harness.REGISTRY[name]
    sdf = spec.fn(spark, SF_CORRECT)
    if spec.oracle is None:
        assert sdf.count() >= 0  # rows-only check, mirroring the driver
        return
    oracle = spec.oracle() if callable(spec.oracle) else spec.oracle
    con = duck(SF_CORRECT)
    problems = compare(sdf, con.sql(oracle))
    assert not problems, f"{name}: " + "; ".join(problems[:5])


def test_entry_smoke(spark):
    import importlib, sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    assert df.count() > 0
