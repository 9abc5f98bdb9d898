"""Training-batch assembly operators: sequence packing and domain mixing.

The last mile of a 100 TB curation pipeline: curated documents become
fixed-length training sequences (packing) drawn with per-domain weights
(mixing). Both are pure DataFrame ops — packing is a per-shard window
cumsum, mixing a broadcast join + explode — so they inherit Spark's
partitioning instead of inventing their own scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from aci_export_spark.llm.text import n_tokens


def _md5_bucket(col, salt: str, mod: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % mod
    )


def pack_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 256,
    shards: int = 32,
    salt: str = "pack:v1",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are laid out
    in a deterministic pseudo-random order and the concatenated token
    stream is cut every `window` tokens; each doc learns which packs it
    lands in (`first_pack`..`last_pack`, crossing boundaries is allowed —
    that IS the concat-and-chunk semantic) and where it starts
    (`start_off`).

    Scale shape: a single global order would serialize the cumsum into one
    window partition, so the corpus is first sharded by md5 bucket and
    packed WITHIN each shard — `shards` independent window partitions, one
    shuffle, embarrassingly parallel, and the assignment is reproducible
    across runs/engines because order is (md5, id), never RNG. Pack ids are
    globally unique as (shard, pack_in_shard).
    """
    ord_key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    t = df.select(
        F.col(id_col),
        n_tokens(F.col(text_col)).alias("n_tokens"),
        ord_key.alias("__ord"),
        _md5_bucket(F.col(id_col), salt, shards).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("__ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        id_col,
        "shard",
        "n_tokens",
        F.col("start_off").cast("long").alias("start_off"),
        F.floor(F.col("start_off") / window).cast("long").alias("first_pack"),
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / window)
        .cast("long")
        .alias("last_pack"),
    )


def weighted_epoch_mix(
    df: DataFrame,
    weights: DataFrame,
    stratum_col: str = "source",
    weight_col: str = "weight",
) -> DataFrame:
    """Domain mixing by integer upsampling: each row is repeated `weight`
    times (tagged `epoch_copy` 1..w) according to its stratum's weight —
    the deterministic version of sampling-with-temperature that training
    dataloaders apply per epoch. Weight 0 drops the stratum.

    The weight table is domain-sized → broadcast; the explode is a narrow
    map (no shuffle), so at 100 TB this is one scan producing `Σ wᵢ·nᵢ`
    rows with perfect reproducibility (no RNG, no sampling variance).
    """
    copies = F.when(
        F.col(weight_col) >= 1,
        F.sequence(F.lit(1), F.col(weight_col).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.join(broadcast(weights), on=stratum_col)
        .withColumn("epoch_copy", F.explode(copies))
        .drop(weight_col)
    )


def pack_efficiency(assignments: DataFrame, window: int = 256) -> DataFrame:
    """Packing-efficiency report over :func:`pack_assignments` output — the
    numbers a batch-assembly pipeline monitors per shard:

    - ``n_packs``: fixed-length sequences produced (max last_pack + 1);
    - ``tail_pad``: padding tokens in the shard's final partial pack — the
      ONLY waste concat-and-chunk incurs (every interior pack is full by
      construction);
    - ``n_crossing``: documents straddling a pack boundary — the
      attention-mask / document-boundary cost of the concat semantic (the
      dial against padding waste: respecting boundaries pads more, chunking
      crosses more).

    All exact integers over the assignment table (shard-count × stats —
    tiny); one aggregation, no rescan of the corpus."""
    return (
        assignments.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.max("last_pack") + 1).cast("long").alias("n_packs"),
            F.sum((F.col("last_pack") > F.col("first_pack")).cast("int"))
            .cast("long")
            .alias("n_crossing"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "n_packs",
            (F.col("n_packs") * window - F.col("total_tokens"))
            .cast("long")
            .alias("tail_pad"),
            "n_crossing",
        )
    )
