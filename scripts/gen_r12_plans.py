"""Capture .explain('formatted') for the r12-touched queries.

Usage:
  python scripts/gen_r12_plans.py <suffix> <outdir> [repo_root]

Writes <outdir>/<query>_<suffix>.txt for each query in QUERIES, importing
the engine from repo_root (default: this script's repo). Run once from the
r11 checkout with suffix=before and once from HEAD with suffix=after.
SPARK_GRAFT_PLAN_CAPTURE=1 so shared artifacts return their lazy
computation instead of an opaque checkpoint scan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

QUERIES = [
    "er_jaro_winkler_pairs",
    "events_bootstrap_ci",
    "mm_ogg_pages",
    "mm_tar_entries",
    "j_salted_join_equivalence",
    "basket_brand_pairs",
    "basket_brand_triples",
    "graph_brand_triangles",
    "graph_brand_pagerank",
    "graph_brand_kcore",
    "er_fuzzy_entities",
    "llm_dedup_cluster_canonical",
]


def main() -> None:
    suffix = sys.argv[1]
    outdir = sys.argv[2]
    root = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    os.environ["SPARK_GRAFT_PLAN_CAPTURE"] = "1"
    sys.path.insert(0, root)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aci_export_spark.session import get_spark
    from aci_export_spark import harness

    spark = get_spark("gen-r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()
    for name in QUERIES:
        if name not in harness.REGISTRY:
            print(f"skip {name}: not registered in {root}")
            continue
        try:
            df = harness.REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {name}_{suffix}.txt")
        except Exception as e:  # capture what we can, note the rest
            print(f"FAILED {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
