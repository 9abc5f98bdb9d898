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
from aci_export_spark.localrows import local_rows_df


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


def pack_sign_bits(vec_col: Column, dim: int) -> list[Column]:
    """1-bit (sign) quantization: pack ``vec[i] > 0`` bits into 32-bit
    words carried as positive longs — one word per 32 dims, bit j of word
    w set when vec[w*32 + j] > 0 (1-based array indexing).

    32-bit words (not 64) keep every packed value strictly positive, so
    the packing arithmetic never touches the sign bit and the identical
    integer comes out of both engines (a 64-bit pack would need 1<<63,
    which two's-complement-wraps differently under different overflow
    regimes).  Each word is one ordered fold over its 32 elements — JVM
    codegen, no UDF.
    """
    n_words = (dim + 31) // 32
    words = []
    for w in range(n_words):
        bits = [
            F.when(
                F.element_at(vec_col, w * 32 + j + 1) > 0.0,
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(min(32, dim - w * 32))
        ]
        word = bits[0]
        for b in bits[1:]:
            word = word + b
        words.append(word)
    return words


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    shortlist: int = 30,
) -> DataFrame:
    """Binary-quantized ANN with asymmetric exact rerank (the
    RaBitQ / FAISS IndexBinaryFlat shape): corpus and query vectors are
    sign-quantized to `dim` bits (:func:`pack_sign_bits`), candidates
    ranked by Hamming distance — ``bit_count(xor)`` per 32-bit word, pure
    integer, 16x smaller than the float vectors — then the top
    ``shortlist`` per query are reranked by EXACT cosine over the original
    floats.  Output: (query_id, neighbor_id, hamming, rank), rank by
    (cosine desc, neighbor asc) — the rank-only float discipline of
    :func:`brute_force_topk`; hamming itself is engine-exact integer.

    Scale: the Hamming scan reads dim/8 bytes per corpus row instead of
    4*dim — the binary code table is the only full-corpus read, and it
    composes under IVF cells exactly like the SQ8/PQ code tables (assign
    cells once, Hamming-scan only probed cells).  The float vectors are
    touched for shortlist*|queries| rows only.  Queries broadcast; the
    expensive rerank fold runs on the shortlist, not the corpus.
    """
    qw = pack_sign_bits(F.col(vec_col), dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        *[w.alias(f"__qw{i}") for i, w in enumerate(qw)],
    )
    cw = pack_sign_bits(F.col(vec_col), dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        *[w.alias(f"__cw{i}") for i, w in enumerate(cw)],
    )
    n_words = (dim + 31) // 32
    ham: Column = F.lit(0).cast("long")
    for i in range(n_words):
        ham = ham + F.bit_count(
            F.col(f"__qw{i}").bitwiseXOR(F.col(f"__cw{i}"))
        ).cast("long")
    scored = c.join(
        broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).withColumn("hamming", ham)
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("__srank", F.row_number().over(w_short))
        .filter(F.col("__srank") <= shortlist)
        .withColumn(
            "__cos", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        short.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


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


def load_fit_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
):
    """Pull the bounded deterministic training sample (smallest
    `hash64(id, SAMPLE_SALT)` keys — TakeOrderedAndProject: one scan, no
    shuffle, no full sort) as a float64 numpy array. Factored out so the
    coarse quantizer and the PQ sub-quantizers train on ONE sample pull
    instead of re-scanning per fit."""
    import numpy as np

    from aci_export_spark.llm.hashing import hash64

    pdf = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy(hash64(F.col(id_col).cast("string"), SAMPLE_SALT).asc())
        .limit(sample_rows)
        .toPandas()  # Arrow transfer: ~10× faster than Row collect
    )
    return np.stack(pdf["__v"].to_numpy()).astype(np.float64)


def kmeans_fit_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_rows: int = 4096,
    id_col: str = "vec_id",
    sample_arr=None,
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
    the training set itself must stay distributed). Pass `sample_arr` (from
    :func:`load_fit_sample`) to reuse an already-pulled sample.
    """
    arr = (
        sample_arr
        if sample_arr is not None
        else load_fit_sample(corpus, vec_col, id_col, sample_rows)
    )
    return _kmeans_numpy(arr, k_cells, seed, max_iter)


def _reference_fit_assign(
    parquet_path: str,
    id_col: str,
    vec_col: str,
    k_cells: int,
    seed: int,
    sample_rows: int,
    max_iter: int,
):
    """Shared front half of the numpy golden references: parquet read,
    md5-keyed sample selection (identical to kmeans_fit_sample), seeded
    kmeans fit, nearest-centroid assignment (argmin = lowest-index
    tie-break, matching the (distance², index) struct sort in
    ivf_assign_centroids), and norms. ONE implementation — the IVF-flat
    and IVF-SQ8 references must not be able to diverge on the fit or
    assignment conventions."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

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
    return ids, vecs, d2, cell, norms


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
    import numpy as np

    ids, vecs, d2, cell, norms = _reference_fit_assign(
        parquet_path, id_col, vec_col, k_cells, seed, sample_rows, max_iter
    )

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


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ): the FAISS memory-resident-index shape.
# Vectors are compressed to m small codes (here m sub-spaces × ksub
# centroids each → m bytes-ish per vector); search scans CODES with a
# per-query lookup table (ADC) and fetches full vectors only for the
# shortlist it re-ranks. At 100 TB the code table is ~dim·8/m× smaller than
# the raw vectors — it is the difference between an index that fits in
# cluster memory and one that doesn't.
# ---------------------------------------------------------------------------


def pq_fit_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_rows: int = 2048,
    sample_arr=None,
) -> list[list[list[float]]]:
    """Train PQ sub-quantizer codebooks on the same bounded deterministic
    sample as :func:`kmeans_fit_sample` (smallest md5-derived keys — one
    TakeOrdered scan, no shuffle) — FAISS discipline: training cost is flat
    in corpus size. The vector is split into `m` contiguous sub-spaces of
    dim/m components; each gets an independent seeded kmeans++/Lloyd fit
    (seed offset per sub-space). Returns codebooks[m][ksub][dsub]. Pass
    `sample_arr` (from :func:`load_fit_sample`) to reuse an already-pulled
    sample."""
    arr = (
        sample_arr
        if sample_arr is not None
        else load_fit_sample(corpus, vec_col, id_col, sample_rows)
    )
    dim = arr.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        _kmeans_numpy(arr[:, s * dsub : (s + 1) * dsub], ksub, seed + s, max_iter)
        for s in range(m)
    ]


def _pq_codebooks_sql(codebooks: list[list[list[float]]]) -> tuple[str, int]:
    """One constant-folded literal for the whole codebook set:
    `array<struct<off:int, cb:array<struct<j:int, c:array<double>>>>>` —
    same discipline as `_ranked_cells_sql`: a single constant keeps driver
    analysis flat in m·ksub·dsub."""
    dsub = len(codebooks[0][0])
    sql = "array(" + ",".join(
        "struct(%d as off, array(%s) as cb)"
        % (
            s * dsub,
            ",".join(
                "struct(%d as j, array(%s) as c)"
                % (j, ",".join("%.17gD" % x for x in c))
                for j, c in enumerate(cb)
            ),
        )
        for s, cb in enumerate(codebooks)
    ) + ")"
    return sql, dsub


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode every vector to its `array<int>` of m sub-space codes (nearest
    sub-centroid per sub-space, lowest-index tie-break via (d², j) struct
    sort). Pure column expressions in whole-stage codegen: one scan, zero
    shuffle, zero Python — the 100 TB encode is a single map the corpus
    write pipelines with. Sub-space distances fold the slice of the vector
    against each sub-centroid in element order (bit-reproducible by the
    numpy reference)."""
    cb_sql, dsub = _pq_codebooks_sql(codebooks)
    code = F.expr(
        f"transform({cb_sql}, sb -> array_sort(transform(sb.cb, e -> struct("
        f"aggregate(zip_with(slice(cast({vec_col} as array<double>), sb.off + 1, "
        f"{dsub}), e.c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) "
        "as d, e.j as i)))[0].i)"
    )
    return df.withColumn(code_col, code)


def _pq_lut_expr(codebooks: list[list[list[float]]], vec_col: str) -> Column:
    """Per-query ADC lookup table: `array<array<double>>` of m × ksub
    sub-distances² between the query's sub-vector and every sub-centroid.
    Computed once per query row; the candidate scan then costs m array
    lookups + adds per code — the whole point of PQ."""
    cb_sql, dsub = _pq_codebooks_sql(codebooks)
    return F.expr(
        f"transform({cb_sql}, sb -> transform(sb.cb, e -> "
        f"aggregate(zip_with(slice(cast({vec_col} as array<double>), sb.off + 1, "
        f"{dsub}), e.c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)))"
    )


def ivf_pq_topk(
    encoded_corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    nprobe: int = 3,
    shortlist: int = 15,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ search with exact re-rank (the FAISS IVFPQR shape).

    1. Each query probes its `nprobe` nearest coarse cells (one constant-
       folded expression over the centroid literal — no centroid join) and
       carries its ADC lookup table.
    2. The CODE table — not the vectors — joins the broadcast probe set on
       the cell; the approximate distance per candidate is m lookups + adds
       (`zip_with(code, lut)` fold). Per-query (ADC, id) window keeps the
       `shortlist` best.
    3. Only shortlist rows join back to the full vectors for exact-cosine
       re-ranking to top-k.

    Scale shape: the scan side touches codes only (≈ m bytes/vector vs
    8·dim), the vector fetch is shortlist-sized and hits the corpus by id
    (broadcast of queries·shortlist ids), and everything is expressions in
    whole-stage codegen. Returns (query_id, neighbor_id, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _pq_lut_expr(codebooks, vec_col).alias("__lut"),
        F.explode(
            F.expr(
                f"transform(slice({_ranked_cells_sql(centroids, vec_col)}, 1, "
                f"{int(nprobe)}), p -> p.i)"
            )
        ).alias(cell_col),
    )
    codes = encoded_corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(cell_col), F.col(code_col)
    )
    adc = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.col("__lut"),
            lambda c, lut: F.element_at(lut, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc()
    )
    short = (
        codes.join(broadcast(q), on=cell_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__adc", adc)
        .withColumn("__sr", F.row_number().over(ws))
        .filter(F.col("__sr") <= shortlist)
        .select("query_id", "neighbor_id", "__qv")
    )
    # exact re-rank: fetch full vectors for the shortlist only
    vecs = encoded_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        vecs.join(broadcast(short), on="neighbor_id")
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv"))
            / (l2_norm(F.col("__qv")) * F.col("__cn")),
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


def pq_reference_cell_codes(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
) -> dict[int, tuple[int, list[int]]]:
    """Single-process reference for the IVF-PQ LAYOUT: {vec_id: (cell,
    [m codes])} over the whole parquet — the md5-keyed sample, seeded
    fits, sequential-fold distances and low-index tie-breaks of
    :func:`pq_reference_topk_numpy`, stopping at the encode (no search).
    Backs the incremental-index-maintenance golden oracle; kept separate
    from the search reference rather than refactoring it so the proven
    golden search path stays byte-identical."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    dsub = dim // m

    keys = np.array(
        [
            int(hashlib.md5(f"{SAMPLE_SALT}{int(i)}".encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    sample = vecs[np.argsort(keys, kind="stable")[:sample_rows]]
    cent = np.asarray(_kmeans_numpy(sample, k_cells, seed, max_iter))
    books = [
        np.asarray(
            _kmeans_numpy(sample[:, s * dsub : (s + 1) * dsub], ksub, seed + s, max_iter)
        )
        for s in range(m)
    ]

    def seq_d2(a, b) -> float:
        acc = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            acc += (x - y) * (x - y)
        return acc

    out: dict[int, tuple[int, list[int]]] = {}
    for i, v in enumerate(vecs):
        ds = [seq_d2(v, c) for c in cent]
        cell = min(range(k_cells), key=lambda j: (ds[j], j))
        codes = []
        for s in range(m):
            sub = v[s * dsub : (s + 1) * dsub]
            sds = [seq_d2(sub, e) for e in books[s]]
            codes.append(min(range(ksub), key=lambda j: (sds[j], j)))
        out[int(ids[i])] = (cell, codes)
    return out


def pq_reference_topk_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
    nprobe: int = 3,
    shortlist: int = 15,
    k: int = 5,
    n_queries: int = 20,
) -> list[tuple[int, int, int]]:
    """Single-process golden reference for the whole IVF-PQ path (sample →
    coarse fit → sub-quantizer fits → encode → probe → ADC shortlist →
    exact re-rank). All distance folds use SEQUENTIAL Python summation in
    element order, bit-matching Spark's `aggregate(..., 0D, acc + x)` fold —
    equal PQ codes therefore produce exactly equal ADC distances in both
    engines, and the id tie-break resolves them identically (numpy's
    pairwise `np.sum` would not guarantee that). Backs the harness golden-
    VALUES oracle, the llm_sim_ivf_kmeans pattern."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    dsub = dim // m

    keys = np.array(
        [
            int(hashlib.md5(f"{SAMPLE_SALT}{int(i)}".encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    sample = vecs[np.argsort(keys, kind="stable")[:sample_rows]]
    cent = np.asarray(_kmeans_numpy(sample, k_cells, seed, max_iter))
    books = [
        np.asarray(
            _kmeans_numpy(sample[:, s * dsub : (s + 1) * dsub], ksub, seed + s, max_iter)
        )
        for s in range(m)
    ]

    def seq_d2(a, b) -> float:
        acc = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            acc += (x - y) * (x - y)
        return acc

    # coarse assignment + PQ encode, sequential-fold distances w/ low-index ties
    cell = np.empty(len(vecs), dtype=int)
    qd2 = np.empty((len(vecs), k_cells))
    for i, v in enumerate(vecs):
        ds = [seq_d2(v, c) for c in cent]
        qd2[i] = ds
        cell[i] = min(range(k_cells), key=lambda j: (ds[j], j))
    codes = np.empty((len(vecs), m), dtype=int)
    for i, v in enumerate(vecs):
        for s in range(m):
            sub = v[s * dsub : (s + 1) * dsub]
            ds = [seq_d2(sub, e) for e in books[s]]
            codes[i, s] = min(range(ksub), key=lambda j: (ds[j], j))
    norms = np.linalg.norm(vecs, axis=1)

    def seq_cos(a, b, na, nb) -> float:
        acc = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            acc += x * y
        return acc / (na * nb)

    rows: list[tuple[int, int, int]] = []
    for qi in np.argsort(ids, kind="stable"):
        qid = int(ids[qi])
        if qid >= n_queries:
            continue
        probe_cells = sorted(range(k_cells), key=lambda j: (qd2[qi][j], j))[:nprobe]
        lut = [
            [seq_d2(vecs[qi][s * dsub : (s + 1) * dsub], e) for e in books[s]]
            for s in range(m)
        ]
        cidx = np.nonzero(np.isin(cell, probe_cells) & (ids != qid))[0]

        def adc(ci) -> float:
            acc = 0.0
            for s in range(m):
                acc += lut[s][codes[ci, s]]
            return acc

        sl = sorted(cidx, key=lambda ci: (adc(ci), ids[ci]))[:shortlist]
        order = sorted(
            sl, key=lambda ci: (-seq_cos(vecs[qi], vecs[ci], norms[qi], norms[ci]), ids[ci])
        )[:k]
        rows.extend((qid, int(ids[ci]), r + 1) for r, ci in enumerate(order))
    return rows


# ---------------------------------------------------------------------------
# MMR diversified re-ranking: retrieval returns the k most RELEVANT-BUT-
# DIVERSE results, not k near-copies of the best hit (Carbonell & Goldstein
# 1998). For training-data curation the same greedy selects a diverse
# subsample from a near-duplicate-heavy candidate pool.
# ---------------------------------------------------------------------------


def _mmr_select(
    qv: list[float],
    ids: list[int],
    vecs: list[list[float]],
    k: int,
    lam: float,
) -> list[int]:
    """Greedy MMR over one query's candidate pool, pure sequential-fold
    Python arithmetic (no BLAS — OpenBLAS threaded matmuls do not guarantee
    a summation order, which would break the bit-exact golden oracle; pools
    are bounded-small so the O(pool²·dim) loops are trivial). Score of a
    candidate d given the selected set S:
        lam · cos(q, d) − (1 − lam) · max_{s∈S} cos(d, s)
    with the first pick scored lam · cos(q, d); ties break on the smaller
    candidate id. Returns ids in selection order."""

    def seq_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    import math

    qn = math.sqrt(seq_dot(qv, qv))
    norms = [math.sqrt(seq_dot(v, v)) for v in vecs]
    simq = [seq_dot(qv, v) / (qn * n) for v, n in zip(vecs, norms)]
    # pool×pool cosine, computed once (symmetric, but recomputing the lower
    # triangle keeps index arithmetic obvious at this size)
    sims = [
        [seq_dot(a, b) / (na * nb) for b, nb in zip(vecs, norms)]
        for a, na in zip(vecs, norms)
    ]
    remaining = list(range(len(ids)))
    chosen: list[int] = []
    while remaining and len(chosen) < k:
        best = min(
            remaining,
            key=lambda i: (
                -(
                    lam * simq[i]
                    - (1.0 - lam) * max(sims[i][j] for j in chosen)
                    if chosen
                    else lam * simq[i]
                ),
                ids[i],
            ),
        )
        chosen.append(best)
        remaining.remove(best)
    return [int(ids[i]) for i in chosen]


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    qvec_col: str = "__qv",
    vec_col: str = "__cv",
) -> DataFrame:
    """Re-rank each query's candidate pool with greedy MMR; emits
    (query_id, neighbor_id, mmr_rank) with mmr_rank = selection order.

    `candidates` carries one row per (query, candidate) with both vectors
    attached — the output of any ANN path joined back to embeddings. The
    greedy is genuinely per-group imperative (each pick depends on the set
    selected so far), so this is the sanctioned Arrow escape hatch:
    `applyInPandas` grouped by query — groups are pool-sized (bounded by the
    upstream top-N), queries spread across executors, one Arrow round trip
    per group. At 100 TB the pool bound is what keeps this flat: MMR cost is
    O(pool²·dim) per query regardless of corpus size."""
    import pandas as pd

    def select(pdf: "pd.DataFrame") -> "pd.DataFrame":
        qid = pdf[query_col].iloc[0]
        qv = list(pdf[qvec_col].iloc[0])
        ids = [int(x) for x in pdf[id_col]]
        vecs = [list(v) for v in pdf[vec_col]]
        picked = _mmr_select(qv, ids, vecs, k, lam)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(picked),
                "neighbor_id": picked,
                "mmr_rank": list(range(1, len(picked) + 1)),
            }
        )

    return candidates.groupBy(query_col).applyInPandas(
        select, schema="query_id long, neighbor_id long, mmr_rank int"
    )


def mmr_reference_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pool: int = 12,
    k: int = 5,
    lam: float = 0.7,
    n_queries: int = 20,
) -> list[tuple[int, int, int]]:
    """Single-process golden for brute-pool + MMR: exact cosine top-`pool`
    per query (sequential folds, id tie-breaks — bit-matching the JVM
    `dot`/`l2_norm` expressions), then the SAME `_mmr_select` the Arrow UDF
    runs. Returns (query_id, neighbor_id, mmr_rank) rows."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = np.asarray(tbl[id_col].to_pylist())
    vecs = [list(map(float, v)) for v in tbl[vec_col].to_pylist()]

    def seq_dot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    norms = [math.sqrt(seq_dot(v, v)) for v in vecs]
    rows: list[tuple[int, int, int]] = []
    for qi in np.argsort(ids, kind="stable"):
        qid = int(ids[qi])
        if qid >= n_queries:
            continue
        cos = [
            (seq_dot(vecs[qi], vecs[ci]) / (norms[qi] * norms[ci]), int(ids[ci]), ci)
            for ci in range(len(vecs))
            if int(ids[ci]) != qid
        ]
        top = sorted(cos, key=lambda t: (-t[0], t[1]))[:pool]
        picked = _mmr_select(
            vecs[qi], [t[1] for t in top], [vecs[t[2]] for t in top], k, lam
        )
        rows.extend((qid, nid, r + 1) for r, nid in enumerate(picked))
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
    cdf = local_rows_df(spark, centers, schema=f"{cell_col} int, __centroid array<double>")

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


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (the FAISS SQ8 shape): per-dimension affine
# quantization of the corpus to uint8 codes, candidate scan in the exact-
# integer quantized domain, shortlist-only vector fetch for the final
# cosine re-rank. The scanned table is dim bytes/vector instead of
# dim*4-byte floats — the memory-bandwidth-bound 100 TB compressed-scan
# path that sits between the raw brute scan and PQ's lossier 8-ints/vector.
# ---------------------------------------------------------------------------


def sq8_minmax_fit(
    corpus: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 'training' pass.

    Unlike the kmeans/PQ fits this is an EXACT streaming aggregate (one
    posexplode + a dim-group map-combined min/max), so it runs on the full
    corpus at any scale; only dim rows come back to the driver."""
    e = corpus.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x")
    )
    rows = e.groupBy("d").agg(F.min("x").alias("mn"), F.max("x").alias("mx")).collect()
    rows.sort(key=lambda r: r["d"])
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def sq8_code(vec_col: Column, mn: list[float], mx: list[float]) -> Column:
    """array<long> SQ8 code: per dim floor(((v - mn) * 255.0) / (mx - mn))
    clamped to [0, 255]; zero-range dims code to 0. The expression order is
    frozen — the DuckDB oracle computes the identical double arithmetic, so
    codes (and every integer derived from them) are bit-identical."""
    mn_a = F.array(*[F.lit(float(x)) for x in mn])
    rng_a = F.array(*[F.lit(float(a) - float(b)) for a, b in zip(mx, mn)])
    shifted = F.zip_with(vec_col.cast("array<double>"), mn_a, lambda v, m: v - m)
    return F.zip_with(
        shifted,
        rng_a,
        lambda s, r: F.when(
            r > 0,
            F.least(
                F.lit(255).cast("long"),
                F.greatest(F.lit(0).cast("long"), F.floor((s * 255.0) / r)),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 15,
) -> DataFrame:
    """SQ8 compressed scan + exact re-rank: for each query, the squared-L2
    distance in the quantized integer domain ranks a shortlist (exact
    BIGINT distances, id tie-break), then ONLY the shortlist's vectors are
    fetched for the exact-cosine top-k. Emits (query_id, neighbor_id,
    sq8_dist, adc_rank, rank) — the integer columns are bit-checkable, the
    float stage is rank-only per the module convention."""
    mn, mx = sq8_minmax_fit(corpus, vec_col)
    ccode = corpus.select(
        F.col(id_col).alias("neighbor_id"), sq8_code(F.col(vec_col), mn, mx).alias("__cc")
    )
    qcode = queries.select(
        F.col(id_col).alias("query_id"), sq8_code(F.col(vec_col), mn, mx).alias("__qc")
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("__qc"), F.col("__cc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("sq8_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        ccode.join(broadcast(qcode), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sq8_dist", sq_dist)
        .withColumn("adc_rank", F.row_number().over(w1))
        .filter(F.col("adc_rank") <= shortlist)
        .select("query_id", "neighbor_id", "sq8_dist", "adc_rank")
    )
    # shortlist-only vector fetch for the exact re-rank
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    rer = (
        short.join(cvec, on="neighbor_id")
        .join(broadcast(qvec), on="query_id")
        .withColumn(
            "__cos",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sq8_dist", "adc_rank", "rank")
    )


def ivf_sq8_topk(
    assigned_corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 3,
    shortlist: int = 15,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF + SQ8 search with exact re-rank — the third member of the FAISS
    index matrix beside IVF-flat and IVF-PQ: cell pruning bounds the scan,
    SQ8 bounds the bytes per scanned row (dim int8 codes vs dim·4 floats;
    PQ compresses harder but lossier).

    1. Queries probe their `nprobe` nearest coarse cells (constant-folded
       centroid expression) carrying their own SQ8 code.
    2. The CODE table joins the broadcast probe set on the cell; the
       candidate distance is the exact BIGINT squared-L2 in the quantized
       domain (bit-checked by the oracle); per-query (dist, id) window
       keeps the `shortlist` best.
    3. Shortlist-only vector fetch for the exact-cosine top-k.

    Returns (query_id, neighbor_id, sq8_dist, rank).
    """
    mn, mx = sq8_minmax_fit(assigned_corpus, vec_col)
    codes = assigned_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col),
        sq8_code(F.col(vec_col), mn, mx).alias("__cc"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        sq8_code(F.col(vec_col), mn, mx).alias("__qc"),
        F.explode(
            F.expr(
                f"transform(slice({_ranked_cells_sql(centroids, vec_col)}, 1, "
                f"{int(nprobe)}), p -> p.i)"
            )
        ).alias(cell_col),
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("__qc"), F.col("__cc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("sq8_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        codes.join(broadcast(q), on=cell_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sq8_dist", sq_dist)
        .withColumn("__sr", F.row_number().over(ws))
        .filter(F.col("__sr") <= shortlist)
        .select("query_id", "neighbor_id", "sq8_dist", "__qv")
    )
    vecs = assigned_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = vecs.join(broadcast(short), on="neighbor_id").withColumn(
        "__cos",
        dot(F.col("__qv"), F.col("__cv")) / (l2_norm(F.col("__qv")) * F.col("__cn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sq8_dist", "rank")
    )


def ivf_sq8_reference_topk_numpy(
    parquet_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    seed: int = 42,
    sample_rows: int = 2048,
    max_iter: int = 20,
    nprobe: int = 3,
    shortlist: int = 15,
    k: int = 5,
    n_queries: int = 20,
) -> list[tuple[int, int, int, int]]:
    """Single-process numpy ground truth for the IVF-SQ8 path (the
    ivf_reference_topk_numpy pattern extended with the quantized-domain
    candidate ranking): sample-fit quantizer → assignment → per-dim
    min/max → SQ8 codes with the frozen expression order → probed-cell
    integer ADC shortlist → exact cosine top-k. Returns
    (query_id, neighbor_id, sq8_dist, rank) rows. Fit/assignment come
    from the SAME helper as the IVF-flat reference
    (:func:`_reference_fit_assign`) so the two golden oracles cannot
    diverge on those conventions."""
    import numpy as np

    ids, vecs, d2, cell, norms = _reference_fit_assign(
        parquet_path, id_col, vec_col, k_cells, seed, sample_rows, max_iter
    )

    mn, mx = vecs.min(0), vecs.max(0)
    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)
    codes = np.where(
        rng > 0, np.clip(np.floor(((vecs - mn) * 255.0) / safe), 0, 255), 0
    ).astype(np.int64)

    rows: list[tuple[int, int, int, int]] = []
    for qi in np.argsort(ids, kind="stable"):
        qid = int(ids[qi])
        if qid >= n_queries:
            continue
        probe_cells = np.argsort(d2[qi], kind="stable")[:nprobe]
        cidx = np.nonzero(np.isin(cell, probe_cells) & (ids != qid))[0]
        dist = ((codes[cidx] - codes[qi]) ** 2).sum(1)
        sl = sorted(range(len(cidx)), key=lambda j: (dist[j], ids[cidx[j]]))[:shortlist]
        sidx = cidx[sl]
        cos = (vecs[sidx] @ vecs[qi]) / (norms[sidx] * norms[qi])
        order = sorted(range(len(sidx)), key=lambda j: (-cos[j], ids[sidx[j]]))[:k]
        rows.extend(
            (qid, int(ids[sidx[j]]), int(dist[sl[j]]), r + 1)
            for r, j in enumerate(order)
        )
    return rows


def retrieval_auc(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1024,
) -> DataFrame:
    """Exact retrieval AUC per query via the Mann-Whitney U statistic —
    the eval-side sibling of hard_negative_topk: treating each query's
    similarity ranking of the corpus as a same-label classifier, AUC is
    the probability a positive (same-label) corpus row outranks a
    negative, computed EXACTLY from integer rank sums (Mann & Whitney
    1947; AUC = U / (n_pos * n_neg)):

        U = rank_sum_pos - n_pos(n_pos+1)/2      (ranks ascending)

    Ties take MIDRANKS (the standard tie-corrected U — a tied pos/neg
    pair contributes ½ to AUC), kept all-integer by working in 2×-scaled
    ranks: a tie group occupying dense ranks [r, r+c-1] has midrank
    (2r+c-1)/2, so ``rank2x = 2·rank() + count(tie group) − 1`` is exact
    int64 and U_2x = rank_sum_pos_2x − n_pos(n_pos+1), AUC =
    U_2x / (2·n_pos·n_neg). (r10 advice: the earlier neighbor_id
    tie-break made the statistic ordering-dependent under the quantized
    grid's ties.)

    Similarity is the NEGATED QUANTIZED squared-L2 distance: vectors are
    floored onto a power-of-two integer grid (floor(x * 1024) — float32
    widens to double exactly and a power-of-two product is exact, so both
    engines mint IDENTICAL integers) and every distance, rank and rank
    sum is int64 from there.  A full-corpus ranking over raw IEEE cosines
    would hinge on ulp-level cross-engine agreement for EVERY adjacent
    pair (the top-k queries only expose the top of the order; AUC exposes
    all of it) — the integer grid removes that cliff entirely, the SQ8
    code-table discipline applied to evaluation.  ``auc`` itself is the
    one IEEE division of exact integers at the output edge.

    Plan: the scoring join is the definitional all-pairs brute scan (tiny
    query side broadcast — the BNLJ-allowlisted ground-truth shape); the
    rank window partitions per query.  AUC NEEDS the full ranking by
    definition — the 100 TB dial is sampled AUC (rank within an
    md5-chosen corpus sample), which changes the estimand, not the plan.
    """
    def qvec(col):
        return F.transform(
            col, lambda x: F.floor(x.cast("double") * quant).cast("long")
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        qvec(F.col(vec_col)).alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__cl"),
        qvec(F.col(vec_col)).alias("__cv"),
    )
    dist = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = c.join(
        broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).withColumn("__d2", dist)
    # ascending similarity = descending distance; integer keys make the
    # order engine-identical, and tied keys share an integer 2×-midrank
    w = Window.partitionBy("query_id").orderBy(F.col("__d2").desc())
    tie = Window.partitionBy("query_id", "__d2")
    ranked = scored.withColumn(
        "__rank2x",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(tie) - 1).cast("long"),
    )
    per = ranked.groupBy("query_id").agg(
        F.sum(F.when(F.col("__cl") == F.col("__ql"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("__cl") != F.col("__ql"), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(
            F.when(F.col("__cl") == F.col("__ql"), F.col("__rank2x")).otherwise(0)
        )
        .cast("long")
        .alias("rank_sum_pos_2x"),
    )
    # all-integer: 2×U = rank_sum_pos_2x − n_pos(n_pos+1); the one IEEE
    # division of exact integers stays at the output edge
    auc_num = F.expr("rank_sum_pos_2x - n_pos * (n_pos + 1)").cast("long")
    auc_den = (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
    return per.select(
        "query_id",
        "n_pos",
        "n_neg",
        "rank_sum_pos_2x",
        auc_num.alias("auc_num_2x"),
        auc_den.alias("auc_den_2x"),
        (auc_num.cast("double") / auc_den.cast("double")).alias("auc"),
    )
