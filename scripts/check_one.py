"""Single-query replica of scripts/driver_sim.py: `python scripts/check_one.py
name [name ...]` runs just the named queries vs their DuckDB oracles at
sf0.01 — the iteration loop while building a new operator."""

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
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-one")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            bad += 1
            continue
        sdf = qs[name](spark, SF).toPandas()
        if name not in os_:
            print(f"{name}: rows-only, {len(sdf)}")
            continue
        odf = con.sql(os_[name]).df()
        ok = len(sdf) == len(odf) and vhash(sdf) == vhash(odf)
        if not ok:
            bad += 1
            ss = sdf.reindex(sorted(sdf.columns), axis=1)
            oo = odf.reindex(sorted(odf.columns), axis=1)
            print("spark cols:", list(ss.columns), "oracle cols:", list(oo.columns))
            print("spark head:\n", ss.head(5).to_string(index=False))
            print("oracle head:\n", oo.head(5).to_string(index=False))
        print(f"{name}: rows {len(sdf)}/{len(odf)} match={ok}")
    print("BAD:", bad)
    spark.stop()
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
