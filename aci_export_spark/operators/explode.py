"""Row-generating operators (reference §2.10 — the only UDTF-like op).

Partner fan-out: one member row → up to 2 outbound documents (primary always,
partner when present; partner doc carries a PRIMARY back-reference to the
primary's email). Reference `ddb/src/members.rs:879-932`.

Implemented as explode of a built-in-constructed array — stays in codegen,
scales linearly, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_pairs(
    df: DataFrame,
    primary_cols: dict[str, Column],
    partner_cols: dict[str, Column],
    partner_present: Column,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Explode each row into a primary record plus (optionally) a partner record.

    `primary_cols` / `partner_cols` map output field name → source expression;
    both must share the same key set. `partner_present` gates the second
    element. Output columns: `carry` passthroughs + the mapped fields +
    `is_partner` boolean.
    """
    names = list(primary_cols.keys())
    if set(names) != set(partner_cols.keys()):
        raise ValueError("primary_cols and partner_cols must share the same field names")

    primary_struct = F.struct(
        *[primary_cols[n].alias(n) for n in names], F.lit(False).alias("is_partner")
    )
    partner_struct = F.struct(
        *[partner_cols[n].alias(n) for n in names], F.lit(True).alias("is_partner")
    )
    records = F.when(
        partner_present, F.array(primary_struct, partner_struct)
    ).otherwise(F.array(primary_struct))

    exploded = df.select(*carry, F.explode(records).alias("__rec"))
    return exploded.select(
        *carry, *[F.col(f"__rec.{n}").alias(n) for n in names], F.col("__rec.is_partner").alias("is_partner")
    )
