"""Local replica of the driver's correctness gate (the /verify harness):
run every registered query AND its DuckDB oracle at sf0.01, compare
row-count + sorted-column value hash, print per-query match lines and a
final BAD count. Mirrors `__spark_entry__` exactly — a plain session with
no engine conf, as the driver builds it."""

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def vhash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.md5(
        str(
            sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
        ).encode()
    ).hexdigest()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    print("SMOKE rows:", E.entry(spark).count())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in os_:
            print(f"{name}: rows-only, {len(sdf)}")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        ok = len(sdf) == len(odf) and vhash(sdf) == vhash(odf)
        if not ok:
            bad += 1
        print(f"{name}: rows {len(sdf)}/{len(odf)} match={ok}")
    print("BAD:", bad)
    spark.stop()
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
