"""Embedding similarity search: brute-force cosine top-k baseline and a
bucketed (IVF-style) scale path.

Vector math is built-in expressions (`zip_with` + `aggregate`) — JVM-side,
no Python. At 100 TB the brute-force path is a broadcast of the (small)
query set against a partitioned corpus scan: linear, no shuffle of the
corpus. The IVF path prunes the scan to matching cells first.

Float caveat: cross-engine float sums differ in final bits, so harness
queries emit *ranks*, not raw cosines (rank flips need near-exact ties,
which random embeddings don't produce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + ordered fold — deterministic element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine.

    queries is broadcast (small by construction); the corpus is scanned once,
    cosine computed per (query, corpus) pair, and a per-query window takes
    the top k. Ties broken by neighbor id for determinism. Self-matches
    (same id) are excluded.
    """
    # norms are hoisted to per-ROW projections: inside the pair join the
    # cosine costs one zip_with fold (the dot), not three — the norm folds
    # would otherwise re-run per (query × corpus) pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query, the
    top-k most similar corpus vectors whose label DIFFERS from the query's
    — the highest-similarity wrong-class examples are exactly the negatives
    that give contrastive/metric-learning losses gradient signal (in-batch
    random negatives are mostly too easy).

    Same physical shape as :func:`brute_force_topk`: queries broadcast, one
    corpus scan, per-row hoisted norms, per-query window top-k with id
    tie-break; the label-mismatch predicate rides the join condition so
    same-class pairs are dropped before the dot product. At corpus scale
    swap the scan for the IVF path (assign cells, probe nearest cells,
    filter label inside the cell) — mining is a search problem and inherits
    whatever index the corpus already carries.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__cl"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = c.join(
        broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("__cl") != F.col("__ql")),
    ).withColumn(
        "__cos",
        dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """IVF-style pruned search: compare only within the query's cell.

    `cell_col` is the coarse quantization (here the given `label`; in a real
    pipeline, the nearest-centroid assignment from a KMeans fit). The join is
    an equi-join on the cell — the corpus shuffle partitions by cell instead
    of broadcasting every query to every row: the 100 TB scan reads only
    matching cells when the corpus is partitioned/bucketed by cell.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(broadcast(q), on="__cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.3,
    emit_cell: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, compared only
    within the same coarse cell (O(cell²) not O(n²) — at 100 TB the corpus is
    partitioned by cell so each executor sees one cell's block; cross-cell
    near-dups are the LSH variant's job).

    Emits id pairs only (id_a < id_b), not the cosine value: cross-engine
    float summation differs in final bits, so the score column would break
    byte-level comparison while the ≥-threshold *decision* does not.
    ``emit_cell=True`` adds the shared cell id back as ``cell`` — both
    endpoints have it by construction, and downstream per-cell operators
    (``partitioned_components``) key on it.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    # per-row norms hoisted out of the pair join (see brute_force_topk)
    sim = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    out = ["id_a", "id_b"] + (
        [F.col("__cell").alias("cell")] if emit_cell else []
    )
    return (
        a.join(b, on="__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim >= threshold)
        .select(*out)
    )


def rp_planes(planes: int = 16, dim: int = 64, seed: str = "rhp") -> list[list[float]]:
    """Deterministic ±1 random-hyperplane components: the parity of the
    60-bit md5 hash of ``"{seed}:{plane}:{dim}"`` (`llm.hashing.hash64`
    semantics, computed here with hashlib — identical bytes, so any engine or
    a plain-Python reference derives the very same planes)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def _rp_bits_sql(planes: list[list[float]], vec_col: str) -> str:
    """SQL for `array<int>`: the sign bit of `vec_col`·plane for every plane.
    The plane set is ONE constant-folded array-of-struct literal and the dot
    products one `transform` lambda — expression-tree size is constant in
    planes·dim (the per-plane-per-dim md5 expression tree this replaces cost
    seconds of driver-side analysis at 16×64; see `_ranked_cells_sql`)."""
    planes_sql = "array(" + ",".join(
        "struct(%d as i, array(%s) as w)"
        % (p, ",".join("%.1fD" % x for x in comp))
        for p, comp in enumerate(planes)
    ) + ")"
    return (
        "transform(" + planes_sql + ", s -> CASE WHEN "
        f"aggregate(zip_with(cast({vec_col} as array<double>), s.w, "
        "(a, b) -> a * b), 0D, (acc, x) -> acc + x) >= 0D THEN 1 ELSE 0 END)"
    )


def random_hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    dim: int = 64,
    seed: str = "rhp",
) -> DataFrame:
    """Sign-LSH bucket assignment: `planes` pseudo-random hyperplanes derived
    deterministically from md5(seed, plane, dim) → ±1 components; bucket =
    the sign bit-string. Groups cosine-similar vectors; candidate pairs then
    verify with exact cosine inside buckets (same shape as MinHash-LSH).
    """
    bits = F.expr(_rp_bits_sql(rp_planes(planes, dim, seed), vec_col))
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(bits, lambda b: b.cast("string")), "").alias(
            "lsh_bucket"
        ),
    )


def rplsh_band_keys(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    band_bits: int,
) -> DataFrame:
    """Banded sign-LSH keys: one (id, band_no, band_key) row per band, where
    `band_key` packs that band's `band_bits` sign bits into an integer.
    Vectors whose cosine is high agree on many sign bits, so they collide on
    ≥1 whole band with high probability (the classic OR-of-ANDs LSH
    amplification); random vectors collide on a band with chance 2^-band_bits.
    One scan, one explode — the sign computation is a single constant-folded
    expression (see `_rp_bits_sql`)."""
    n_bands = len(planes) // band_bits
    bits = F.expr(_rp_bits_sql(planes, vec_col))
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_no"),
            F.aggregate(
                F.slice(F.col("__bits"), b * band_bits + 1, band_bits),
                F.lit(0),
                lambda acc, x: acc * 2 + x,
            ).alias("band_key"),
        ),
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), bits.alias("__bits"))
        .select(F.col(id_col), F.explode(bands).alias("__b"))
        .select(
            F.col(id_col),
            F.col("__b.band_no").alias("band_no"),
            F.col("__b.band_key").alias("band_key"),
        )
    )


def rplsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    band_bits: int = 4,
    dim: int = 64,
    seed: str = "rhp",
    k: int = 5,
) -> DataFrame:
    """Random-hyperplane (sign) LSH approximate top-k: candidates are corpus
    vectors sharing ≥1 LSH band with the query; candidates are ranked by
    exact cosine. The third ANN strategy next to IVF (metric-tree style cell
    pruning) and brute force — sign-LSH needs no training pass at all, which
    is why streaming/incremental corpora favor it.

    Scale shape: the corpus band table is linear (n_bands rows per vector)
    and shuffles on the band key; the query bands are broadcast; candidate
    pairs are DISTINCT (query, neighbor) ids only — the 64-float payloads are
    joined back AFTER deduplication, so the band join never carries vectors.
    At 100 TB the expected candidate set per query is corpus·n_bands/2^band_bits
    — the recall/cost dial is (planes, band_bits), same OR-of-ANDs algebra as
    MinHash-LSH banding.
    """
    plane_mat = rp_planes(planes, dim, seed)
    qb = rplsh_band_keys(queries, id_col, vec_col, plane_mat, band_bits).select(
        F.col(id_col).alias("query_id"), "band_no", "band_key"
    )
    cb = rplsh_band_keys(corpus, id_col, vec_col, plane_mat, band_bits).select(
        F.col(id_col).alias("neighbor_id"), "band_no", "band_key"
    )
    cand = (
        cb.join(broadcast(qb), on=["band_no", "band_key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        cand.join(broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_build_kmeans(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k_cells: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    init_mode: str = "k-means||",
):
    """IVF build phase: fit coarse-quantizer centroids with Spark ML KMeans.

    Returns the fitted KMeansModel. The input features are persisted for the
    duration of the fit (KMeans iterates `max_iter` passes — without the
    persist each pass re-reads and re-converts the corpus). `init_mode`
    stays k-means||: balanced centroids translate directly into multiprobe
    recall (random init measurably loses recall on near-uniform data), and
    the init passes run over the persisted features, so they're cheap. At
    100 TB fit on a sample (`corpus.sample(...)`) and assign the full corpus
    with :func:`ivf_assign` (a single map, no shuffle).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).persist()
    try:
        return KMeans(
            k=k_cells, seed=seed, maxIter=max_iter, initMode=init_mode,
            featuresCol="features", predictionCol="cell",
        ).fit(feat)
    finally:
        feat.unpersist()


#: salt for the quantizer-training sample key — md5-derived so the same
#: sample is selectable from any engine (see `llm/hashing.py`)
SAMPLE_SALT = "ivfsample:"


def _kmeans_numpy(arr, k_cells: int, seed: int, max_iter: int) -> list[list[float]]:
    """Seeded kmeans++ init + Lloyd iterations over an in-memory float64
    array. Shared by the Spark fit path (:func:`kmeans_fit_sample`) and the
    single-process golden reference (:func:`ivf_reference_topk_numpy`) — the
    fit is driver-side in both, so sharing it is what makes the distributed
    assignment/search path the only thing under test."""
    import numpy as np

    rng = np.random.default_rng(seed)
    # kmeans++ seeding: spread initial centers ∝ squared distance
    centers = [arr[int(rng.integers(len(arr)))]]
    while len(centers) < k_cells:
        d2 = ((arr[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1).min(1)
        total = d2.sum()
        if total <= 0:  # degenerate: all points coincide with centers
            centers.append(arr[int(rng.integers(len(arr)))])
            continue
        centers.append(arr[int(rng.choice(len(arr), p=d2 / total))])
    cent = np.asarray(centers)
    for _ in range(max_iter):
        lab = ((arr[:, None, :] - cent[None, :, :]) ** 2).sum(-1).argmin(1)
        new = np.array(
            [arr[lab == j].mean(0) if (lab == j).any() else cent[j] for j in range(k_cells)]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return [[float(x) for x in c] for c in cent]


def kmeans_fit_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_rows: int = 4096,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """FAISS-style quantizer training: fit k-means on a BOUNDED sample,
    driver-side, and return plain centroid lists.

    The sample is the `sample_rows` vectors with the smallest
    `hash64(id, SAMPLE_SALT)` — a deterministic pseudo-random choice that the
    planner executes as TakeOrderedAndProject (per-partition partial top-N +
    driver merge of N·partitions rows: one corpus scan, **no shuffle, no full
    sort**). The key is md5-derived from the ID (not an engine-specific hash
    of the vector) so a single-process reference implementation can select
    the *identical* sample and reproduce the index bit-for-bit — that is what
    backs the golden-VALUES oracle for the KMeans-IVF harness query. The fit
    itself is seeded kmeans++ init + Lloyd iterations in numpy. At 100 TB the
    sample is still `sample_rows` vectors, so training cost is
    O(sample·k·iter·dim) — flat in corpus size — while assignment stays fully
    distributed (:func:`ivf_assign_centroids`). This is exactly how
    production IVF indexes (FAISS et al.) train coarse quantizers; a
    job-per-iteration distributed KMeans on a tiny sample pays scheduler
    latency per pass for no accuracy gain (use :func:`ivf_build_kmeans` when
    the training set itself must stay distributed).
    """
    import numpy as np

    from aci_export_spark.llm.hashing import hash64

    pdf = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy(hash64(F.col(id_col).cast("string"), SAMPLE_SALT).asc())
        .limit(sample_rows)
        .toPandas()  # Arrow transfer: ~10× faster than Row collect
    )
    arr = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
    return _kmeans_numpy(arr, k_cells, seed, max_iter)


def ivf_reference_topk_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
    nprobe: int = 3,
    k: int = 5,
    n_queries: int = 20,
) -> list[tuple[int, int, int]]:
    """Single-process numpy ground truth for the whole KMeans-IVF search
    path: sample-fit quantizer → nearest-centroid assignment → multiprobe
    within-cell cosine top-k. Reads the parquet directly (pyarrow — no Spark
    anywhere), so comparing its output to the distributed query checks the
    assignment expressions, the probe fan-out join, and the ranking window
    against an independent implementation (the CDC-chunking golden-oracle
    pattern). Returns (query_id, neighbor_id, rank) rows.
    """
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)

    # identical sample selection to kmeans_fit_sample: smallest 60-bit
    # md5(salt ++ str(id)) keys (hashing.hash64 semantics)
    keys = np.array(
        [
            int(hashlib.md5(f"{SAMPLE_SALT}{int(i)}".encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    sample = vecs[np.argsort(keys, kind="stable")[:sample_rows]]
    cent = np.asarray(_kmeans_numpy(sample, k_cells, seed, max_iter))

    # nearest-centroid assignment; argmin = lowest-index tie-break, matching
    # the (distance², index) struct sort in ivf_assign_centroids
    d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell = d2.argmin(1)
    norms = np.linalg.norm(vecs, axis=1)

    rows: list[tuple[int, int, int]] = []
    for qi in np.argsort(ids, kind="stable"):
        qid = int(ids[qi])
        if qid >= n_queries:
            continue
        probe_cells = np.argsort(d2[qi], kind="stable")[:nprobe]
        cidx = np.nonzero(np.isin(cell, probe_cells) & (ids != qid))[0]
        cos = (vecs[cidx] @ vecs[qi]) / (norms[cidx] * norms[qi])
        order = sorted(range(len(cidx)), key=lambda j: (-cos[j], ids[cidx[j]]))[:k]
        rows.extend((qid, int(ids[cidx[j]]), r + 1) for r, j in enumerate(order))
    return rows


def ivf_assign_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid cell assignment as pure column expressions.

    The whole centroid set is ONE constant-folded literal (an
    `array<struct<i,c>>` built from a single SQL string), and the argmin is
    one `transform` lambda computing distance² per centroid plus an
    `array_min` over (distance², index) structs — struct ordering gives the
    lowest-index tie-break. Shipping the centroids as a *constant* rather
    than 8×dim literal expression nodes keeps driver-side analysis/codegen
    milliseconds-flat in k·dim (the naive per-centroid expression tree cost
    ~2 s of py4j calls + ~3 s of codegen at k=8, dim=64). Executes inside
    whole-stage codegen: one corpus scan, zero shuffle, zero Python, no ML
    pipeline object to ship. The assigned column is what the 100 TB corpus
    gets partitioned/bucketed by."""
    cell = F.expr(f"{_ranked_cells_sql(centroids, vec_col)}[0].i")
    return df.withColumn(cell_col, cell)


def _ranked_cells_sql(centroids: list[list[float]], vec_col: str) -> str:
    """SQL for `array<struct<d,i>>`: every centroid with its distance² to
    `vec_col`, sorted nearest-first (struct order = d, then i). The centroid
    set is one constant-folded literal, the distances one `transform`
    lambda — tree size constant in k·dim."""
    cents_sql = "array(" + ",".join(
        "struct(%d as i, array(%s) as c)"
        % (i, ",".join("%.17gD" % x for x in c))
        for i, c in enumerate(centroids)
    ) + ")"
    return (
        "array_sort(transform(" + cents_sql + ", s -> struct("
        f"aggregate(zip_with(cast({vec_col} as array<double>), s.c, "
        "(a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) as d, "
        "s.i as i)))"
    )


def ivf_assign(
    model,
    df: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (the IVF cell). Pure map
    over the rows — the 100 TB corpus is then written partitioned/bucketed
    by this column so searches read only probed cells."""
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    out = (
        model.copy(model.extractParamMap())
        .setFeaturesCol("__features")
        .setPredictionCol(cell_col)
        .transform(feat)
    )
    return out.drop("__features")


def ivf_topk_multiprobe(
    assigned_corpus: DataFrame,
    queries: DataFrame,
    model,
    nprobe: int = 3,
    cell_col: str = "cell",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Multi-probe IVF search: each query probes its `nprobe` nearest
    centroids and ranks only vectors in those cells.

    The centroid table is tiny (k_cells rows) and broadcast; probing fans
    each query to `nprobe` (query, cell) rows, so the corpus-side join stays
    an equi-join on the cell — reading `nprobe/k_cells` of the corpus per
    query instead of all of it. The recall/cost dial every production IVF
    exposes. `model` is either a fitted Spark ML KMeansModel or a plain
    centroid list (from :func:`kmeans_fit_sample`).

    With a centroid *list*, probe selection is a single expression per query
    row — rank the constant centroid set by distance², slice the nearest
    `nprobe`, explode — no centroid DataFrame, no extra broadcast join, no
    window: at bench scale that halves the query's fixed plan overhead, and
    at 100 TB it's one narrow op over the (small) query set either way.
    """
    spark = assigned_corpus.sparkSession
    if not hasattr(model, "clusterCenters"):
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode(
                F.expr(
                    f"transform(slice({_ranked_cells_sql(model, vec_col)}, 1, "
                    f"{int(nprobe)}), p -> p.i)"
                )
            ).alias(cell_col),
        )
        return _rank_in_probed_cells(assigned_corpus, q, cell_col, id_col, vec_col, k)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cdf = spark.createDataFrame(centers, schema=f"{cell_col} int, __centroid array<double>")

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # rank centroids per query by L2 distance (the quantizer's metric)
    dist2 = F.aggregate(
        F.zip_with(
            F.col("__qv"), F.col("__centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col(cell_col).asc())
    probes = (
        q.join(broadcast(cdf))
        .withColumn("__d2", dist2)
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", cell_col)
    )
    return _rank_in_probed_cells(assigned_corpus, probes, cell_col, id_col, vec_col, k)


def _rank_in_probed_cells(
    assigned_corpus: DataFrame,
    probes: DataFrame,
    cell_col: str,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Score the corpus against the (query, probe-cell) set — equi-join on
    the cell with the small probe side broadcast — and take per-query top-k."""
    c = assigned_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    # query-side norm: one fold per (query × probe) row, corpus-side one per
    # corpus row — the scored join then pays only the dot per candidate
    scored = (
        c.join(broadcast(probes.withColumn("__qn", l2_norm(F.col("__qv")))), on=cell_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
