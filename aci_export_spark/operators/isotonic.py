"""Exact isotonic regression (PAV) for probability calibration.

The standard calibration step for quality/score filters (Zadrozny &
Elkan 2002; Barlow et al. 1972's pool-adjacent-violators): fit the best
non-decreasing step function of a binary outcome against a score grid.
Reference analogue: none (beyond-reference LLM-pipeline surface); used to
calibrate classifier scores before thresholding curation filters.

Exactness discipline: each pool's fitted value is the rational
``y_sum / n_obs``; PAV merge decisions compare adjacent pool levels by
INTEGER cross-multiplication (``y_a * n_b > y_b * n_a``), so the fit is
bit-exact and engine-independent — no float appears until the optional
display grid (``level_ppm``, floored).

100 TB shape: the corpus is reduced in ONE map-side-combined aggregate to
the per-distinct-score sufficient statistic (n, sum_y); only that
grid-bounded table is collected (behind the loud :data:`MAX_ISO_GRID`
cap, the PMI/POS_SPACE discipline) and the sequential PAV stack runs on
the driver in O(grid). The corpus itself is never collected and is
scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from aci_export_spark.localrows import local_rows_df

#: Loud cap on the collected (x, n, sum_y) grid. Calibration grids are
#: score quantizations (hundreds to a few thousand cells); a grid beyond
#: this signals an unquantized float score column, which must fail NAMED
#: instead of OOMing the driver.
MAX_ISO_GRID = 100_000


def pav_pools(
    stats: list[tuple[int, int, int]],
) -> list[tuple[int, int, int, int]]:
    """Stack-based pool-adjacent-violators over (x, n, y_sum) rows sorted
    by x. Returns (x_min, x_max, n_obs, y_sum) pools whose levels
    y_sum/n_obs are strictly increasing. Merges only STRICT violations
    (prev level > cur level), all decisions by integer cross-multiply."""
    pools: list[list[int]] = []
    for x, n, y in stats:
        pools.append([x, x, n, y])
        while len(pools) >= 2:
            _, _, nb, yb = pools[-1]
            _, _, na, ya = pools[-2]
            if ya * nb > yb * na:  # strict violation, exact
                xb0, xb1, _, _ = pools.pop()
                pools[-1][1] = xb1
                pools[-1][2] = na + nb
                pools[-1][3] = ya + yb
            else:
                break
    return [tuple(p) for p in pools]


def isotonic_fit(
    spark: SparkSession,
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_grid: int = MAX_ISO_GRID,
) -> DataFrame:
    """Fit isotonic regression of integer outcome `y_col` (typically 0/1)
    against integer grid `x_col`. Returns one row per pool:
    (pool_idx, x_min, x_max, n_obs, y_sum, level_ppm) where level_ppm =
    floor(y_sum * 1e6 / n_obs) — the exact rational is (y_sum, n_obs)."""
    stats_df = (
        df.groupBy(F.col(x_col).cast("long").alias("x"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(y_col).cast("long")).cast("long").alias("y"),
        )
        .orderBy("x")
    )
    # grid-bounded driver statistic behind the loud cap
    n_cells = stats_df.count()
    if n_cells > max_grid:
        raise ValueError(
            f"isotonic: score grid has {n_cells} cells, exceeding "
            f"MAX_ISO_GRID={max_grid}; quantize the score column before "
            "calibration (this cap exists so an unquantized float score "
            "fails named instead of collecting the corpus)"
        )
    rows = [(r["x"], r["n"], r["y"]) for r in stats_df.collect()]
    pools = pav_pools(rows)
    out = [
        (
            i,
            x_min,
            x_max,
            n,
            y,
            (y * 1_000_000) // n,  # floor on nonneg counts
        )
        for i, (x_min, x_max, n, y) in enumerate(pools)
    ]
    return local_rows_df(
        spark,
        out,
        schema=(
            "pool_idx long, x_min long, x_max long, n_obs long, "
            "y_sum long, level_ppm long"
        ),
    )


def isotonic_reference_python(
    parquet_path: str,
) -> list[tuple[int, int, int, int, int, int]]:
    """Independent single-process reference for the registered calibration
    query: DuckDB computes the per-dollar sufficient statistic, then a
    DEFINITIONAL O(grid^2) PAV (rescan-from-the-left until no adjacent
    violation remains) — a different algorithm from the engine's O(grid)
    stack, so agreement witnesses the stack logic, not a shared bug."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 100
                   AS x,
               COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   ::BIGINT AS y
        FROM read_parquet('{parquet_path}')
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    pools = [[x, x, n, y] for x, n, y in rows]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            xa0, xa1, na, ya = pools[i]
            xb0, xb1, nb, yb = pools[i + 1]
            if ya * nb > yb * na:
                pools[i : i + 2] = [[xa0, xb1, na + nb, ya + yb]]
                changed = True
                break
    return [
        (i, x0, x1, n, y, (y * 1_000_000) // n)
        for i, (x0, x1, n, y) in enumerate(pools)
    ]
