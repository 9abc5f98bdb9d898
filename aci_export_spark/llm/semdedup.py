"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space with a cheap coarse
quantizer, call two documents semantic duplicates when their cosine
similarity within a cluster clears a threshold, and keep ONE representative
per duplicate group.

Spark-first composition of operators this repo already ships:

1. quantizer: :func:`~aci_export_spark.llm.similarity.kmeans_fit_sample`
   (bounded-sample driver fit — flat cost in corpus size) →
   :func:`~aci_export_spark.llm.similarity.ivf_assign_centroids`
   (constant-folded argmin, one scan, zero shuffle);
2. candidate pairs: within-cell cosine ≥ threshold via
   :func:`~aci_export_spark.llm.similarity.embedding_cosine_pairs`
   (O(Σ cell²), never O(n²) — the 100 TB corpus is partitioned by cell);
3. duplicate groups: similarity is not transitive, so pairs become
   components — and because cosine pairs exist only within a cell,
   components never span cells, so
   :func:`~aci_export_spark.operators.graph.partitioned_components`
   (per-cell union-find, one shuffle, zero iterative rounds) replaces the
   general star-contraction loop with identical min-id labels;
4. keep rule: one survivor per component — either the engine-portable
   ``min_id`` (integer ordering, hash-stable across engines) or the paper's
   ``centroid_sim`` rule (keep the member with the LOWEST cosine to its
   cell centroid: near-centroid members are the redundant ones, the
   outlier preserves diversity), tie-broken by id.

Everything is pure column expressions + the iterative CC operator; no
Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aci_export_spark.llm.similarity import (
    embedding_cosine_pairs,
    ivf_assign_centroids,
)
from aci_export_spark.operators.graph import partitioned_components

KEEP_RULES = ("min_id", "centroid_sim")


def centroid_cosine(
    vec_col: str, cell_col: str, centroids: list[list[float]]
) -> Column:
    """Cosine similarity of each row's vector to ITS OWN cell centroid, as
    one constant-folded expression: the centroid matrix and the per-centroid
    norms ship as two array literals indexed by the assigned cell — no join
    against a centroid table, no shuffle, stays in whole-stage codegen."""
    import math

    cents_sql = (
        "array("
        + ",".join(
            "array(%s)" % ",".join("%.17gD" % x for x in c) for c in centroids
        )
        + ")"
    )
    norms_sql = (
        "array("
        + ",".join(
            "%.17gD" % math.sqrt(math.fsum(x * x for x in c)) for c in centroids
        )
        + ")"
    )
    v = f"cast({vec_col} as array<double>)"
    dot = (
        f"aggregate(zip_with({v}, element_at({cents_sql}, {cell_col} + 1), "
        "(a, b) -> a * b), 0D, (acc, x) -> acc + x)"
    )
    vnorm = f"sqrt(aggregate(transform({v}, x -> x * x), 0D, (acc, x) -> acc + x))"
    return F.expr(
        f"{dot} / ({vnorm} * element_at({norms_sql}, {cell_col} + 1))"
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    keep_rule: str = "min_id",
) -> DataFrame:
    """Total (id → cell, component, cluster_size, keep) assignment over the
    corpus: ``keep`` marks the one survivor per semantic-duplicate
    component; singleton components keep themselves. Emits no float scores
    (threshold DECISIONS are engine-stable, score bits are not)."""
    if keep_rule not in KEEP_RULES:
        raise ValueError(f"keep_rule must be one of {KEEP_RULES}: {keep_rule}")
    assigned = ivf_assign_centroids(
        corpus, centroids, vec_col=vec_col, cell_col="cell"
    )
    pairs = embedding_cosine_pairs(
        assigned, id_col=id_col, vec_col=vec_col, cell_col="cell",
        threshold=threshold, emit_cell=True,
    )
    # cosine pairs exist only WITHIN a cell, so components can never span
    # cells — per-cell union-find (one shuffle, no iterative rounds) is
    # provably equivalent to the star algorithm here and is the bounded
    # per-group plan at any scale (cell size is held constant by the
    # caller's k formula); labels are the same component minima
    labels = partitioned_components(pairs, "cell", "id_a", "id_b")
    keyed = assigned.join(
        labels.withColumnRenamed("node", id_col), on=id_col, how="left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    if keep_rule == "centroid_sim":
        keyed = keyed.withColumn(
            "__sim", centroid_cosine(vec_col, "cell", centroids)
        )
        order = [F.col("__sim").asc(), F.col(id_col).asc()]
    else:
        order = [F.col(id_col).asc()]
    w = Window.partitionBy("component").orderBy(*order)
    ws = Window.partitionBy("component")
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(ws))
        .select(
            id_col,
            "cell",
            "component",
            "cluster_size",
            (F.col("__rn") == 1).alias("keep"),
        )
    )


def reference_semantic_dedup_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
    threshold: float = 0.35,
    keep_rule: str = "min_id",
) -> list[tuple[int, int, int, int, bool]]:
    """Single-process numpy ground truth for the whole pipeline (the
    ivf_reference_topk_numpy pattern: pyarrow + numpy, no Spark anywhere) —
    identical sample selection, fit, assignment, pairing, union-find, and
    keep rule. Returns (id, cell, component, cluster_size, keep) rows."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from aci_export_spark.llm.similarity import SAMPLE_SALT, _kmeans_numpy

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    keys = np.array(
        [
            int(hashlib.md5(f"{SAMPLE_SALT}{int(i)}".encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    sample = vecs[np.argsort(keys, kind="stable")[:sample_rows]]
    cent = np.asarray(_kmeans_numpy(sample, k_cells, seed, max_iter))

    d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell = d2.argmin(1)
    norms = np.linalg.norm(vecs, axis=1)

    # union-find over within-cell pairs >= threshold
    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in range(k_cells):
        idx = np.nonzero(cell == c)[0]
        if len(idx) < 2:
            continue
        V = vecs[idx] / norms[idx, None]
        S = V @ V.T
        ai, bi = np.nonzero(np.triu(S >= threshold, 1))
        for a, b in zip(ai, bi):
            ra, rb = find(int(ids[idx[a]])), find(int(ids[idx[b]]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    comp = {int(i): find(int(i)) for i in ids}
    members: dict[int, list[int]] = {}
    for i, c_ in comp.items():
        members.setdefault(c_, []).append(i)

    id_pos = {int(i): n for n, i in enumerate(ids)}
    sim_to_cent = {
        int(i): float(
            vecs[id_pos[int(i)]] @ cent[cell[id_pos[int(i)]]]
            / (
                norms[id_pos[int(i)]]
                * np.linalg.norm(cent[cell[id_pos[int(i)]]])
            )
        )
        for i in ids
    }
    keep: dict[int, int] = {}
    for c_, ms in members.items():
        if keep_rule == "centroid_sim":
            keep[c_] = min(ms, key=lambda i: (sim_to_cent[i], i))
        else:
            keep[c_] = min(ms)
    return sorted(
        (
            int(i),
            int(cell[id_pos[int(i)]]),
            comp[int(i)],
            len(members[comp[int(i)]]),
            int(i) == keep[comp[int(i)]],
        )
        for i in ids
    )


def reference_centroids_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
) -> list[list[float]]:
    """The quantizer :func:`kmeans_fit_sample` would fit, computed without
    Spark (pyarrow sample + the same seeded numpy Lloyd) — bit-identical
    because both paths select the same md5-keyed sample and run the same
    fit. Backs SQL oracles that need the centroids as literals."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from aci_export_spark.llm.similarity import SAMPLE_SALT, _kmeans_numpy

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    keys = np.array(
        [
            int(hashlib.md5(f"{SAMPLE_SALT}{int(i)}".encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    sample = vecs[np.argsort(keys, kind="stable")[:sample_rows]]
    return _kmeans_numpy(sample, k_cells, seed, max_iter)
