"""fs_agreement_patterns (operators/fuzzy.py): hand-computed pattern
counts on a tiny frame; blocking actually restricts the pair space."""

from __future__ import annotations

import pyspark.sql.functions as F

from aci_export_spark.operators.fuzzy import fs_agreement_patterns


def test_hand_computed_patterns(spark):
    rows = [
        # block (1, 'A'): three records -> 3 pairs
        (1, "anna", 1, "A"),
        (2, "anne", 1, "A"),   # lev(anna, anne)=1 -> fuzzy agree with 1
        (3, "zorro", 1, "A"),
        # block (2, 'A'): one record -> no pairs
        (4, "anna", 2, "A"),
        # different segment, same nation as block 1 -> no cross pairs
        (5, "anna", 1, "B"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "segment"])
    got = {
        (r["g_name"],): r["n_pairs"]
        for r in fs_agreement_patterns(
            df,
            id_col="id",
            block_cols=["nation", "segment"],
            agree_exprs={"g_name": F.levenshtein(F.col("a_name"), F.col("b_name")) <= 1},
        ).collect()
    }
    # pairs: (1,2) agree; (1,3), (2,3) disagree
    assert got == {(True,): 1, (False,): 2}


def test_pair_space_is_blocked_and_ordered(spark):
    rows = [(i, f"n{i}", i % 2, "S") for i in range(6)]
    df = spark.createDataFrame(rows, ["id", "name", "nation", "segment"])
    out = fs_agreement_patterns(
        df,
        id_col="id",
        block_cols=["nation"],
        agree_exprs={"g_always": F.lit(True)},
    ).collect()
    # two blocks of 3 -> 3 pairs each = 6 total, never the unblocked 15
    assert sum(r["n_pairs"] for r in out) == 6
