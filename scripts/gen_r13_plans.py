"""Capture .explain('formatted') for the r13-touched queries.

Usage:
  python scripts/gen_r13_plans.py <suffix> <outdir> [repo_root] [names...]

Writes <outdir>/<query>_<suffix>.txt for each query in QUERIES (or the
explicit names given), importing the engine from repo_root (default: this
script's repo). Run once from the r12 checkout with suffix=before and once
from HEAD with suffix=after. SPARK_GRAFT_PLAN_CAPTURE=1 so shared
artifacts return their lazy computation instead of an opaque checkpoint
scan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

QUERIES = [
    # sequential-fixed-point family (local fast paths + localrows SQL build)
    "llm_bpe_train",
    "llm_bpe_train_batched",
    "llm_wordpiece_train",
    "llm_unigram_tokenizer_train",
    # one-pass pair expansion
    "pref_bradley_terry_brands",
    # adaptive-fan-out bisection
    "orders_exact_quantiles",
]


def main() -> None:
    suffix = sys.argv[1]
    outdir = sys.argv[2]
    root = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    names = sys.argv[4:] or QUERIES
    os.environ["SPARK_GRAFT_PLAN_CAPTURE"] = "1"
    sys.path.insert(0, root)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aci_export_spark.session import get_spark
    from aci_export_spark import harness

    spark = get_spark("gen-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    harness._ensure_all_registered()
    for name in names:
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
