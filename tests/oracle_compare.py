"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle side-by-side and compare row count, column names, and values
(order-insensitive; columns sorted by name, like the driver)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        # unify date-like values to ISO strings, bytes to hex, arrays to tuples
        if s.dtype == object or str(s.dtype).startswith(("datetime", "date")):
            out[c] = s.map(
                lambda v: v.isoformat()
                if hasattr(v, "isoformat")
                else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
        if str(s.dtype) in ("bool", "boolean"):
            out[c] = s.astype("object")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark_df, duck_rel, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a = _normalize(spark_df.toPandas())
    b = _normalize(duck_rel.df())
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    # dtype-kind mismatches (int vs float, e.g. DuckDB HUGEINT → float64) break
    # the driver's string-based value hash even when values are "equal"
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"}:
            problems.append(f"col {c}: dtype kind differs spark={a[c].dtype} oracle={b[c].dtype}")
    if problems:
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y and abs(x - y) > float_tol * max(abs(x), abs(y), 1.0):
                    problems.append(f"col {c} row {i}: {x!r} != {y!r}")
                    break
            elif x != y:
                problems.append(f"col {c} row {i}: {x!r} != {y!r}")
                break
    return problems
