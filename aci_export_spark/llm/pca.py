"""Distributed PCA whitening of an embedding column — the standard
pre-processing stage in front of the ANN index family (llm/similarity.py):
mean-center, rotate onto the top-k principal components, scale each to unit
variance. FAISS ships it as `PCAMatrix`/OPQ pre-transforms; curation
pipelines run it before IVF/PQ because quantizers fit better on decorrelated
axes.

Exactness architecture (the engine-vs-oracle contract for an algorithm that
is floating-point by nature):

1. **Moments are EXACT.** The second-moment matrix is a sum of per-row
   outer products; float summation is order-dependent, and a distributed
   sum will never visit rows in the reference's order. So each product
   x_i*x_j (exact in double: two float32 mantissas fit in 53 bits) is
   quantized to DECIMAL(38,18) (half-up — the one lossy step, applied
   identically by both engines) and summed EXACTLY. Order vanishes from
   the algebra; Spark's shuffle-combine tree and the reference's
   row-major numpy loop produce the same decimals bit-for-bit.
2. **Covariance assembly is exact rationals** (cov = sxx/n - μμᵀ in
   `fractions.Fraction`), converted once — correctly rounded — to the
   float64 matrix. Both sides therefore hand `np.linalg.eigh` THE SAME
   matrix, and eigh is deterministic for a fixed input on a fixed BLAS —
   the shared-deterministic-kernel status the seeded kmeans/PQ fits
   already have (`llm/similarity.py` quantizer discipline). Eigenvectors
   are sign-canonicalized (largest-|component| entry positive, lowest
   index on ties) so the convention is explicit rather than inherited.
3. **Projection stays JVM-side and order-fixed.** Each whitened component
   is one `aggregate(sequence(...))` fold — a LEFT-TO-RIGHT IEEE sum the
   single-process reference replays verbatim — so no BLAS batching or
   Arrow slicing can reorder it. No Python runs per row.

Scale shape (100 TB): the moment pass is one map-side-combined aggregation
to d + d(d+1)/2 groups (the explode emits O(n·d²) rows but they combine
within tasks; only #groups × #tasks partial rows shuffle); the collect is
d²-bounded (the kmeans-fit discipline); the projection is a stateless
per-row expression. The exact-decimal quantum is the price of an
engine-checkable oracle — at petabyte row counts swap the moment pass to
per-batch float64 numpy partials (mapInPandas) and accept last-ulp drift,
keeping this path as the audit twin.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DECIMAL(38,18) — 20 integer digits of headroom for the exact sums
_DEC = "decimal(38,18)"


def _pair_index_expr(dim: int) -> str:
    """SQL lambda body mapping (i, j) with i<=j (0-based) to the packed
    upper-triangle offset i*dim - i*(i-1)/2 + (j - i)."""
    return f"(i * {dim} - (i * (i - 1)) DIV 2 + (j - i))"


def _valid_vec(vec_col: str, dim: int) -> "F.Column":
    """dim-length AND fully non-null: a NULL element would be silently
    skipped by SUM but still counted by COUNT, corrupting the moments
    (and the reference would crash on float(None)) — invalid vectors are
    excluded from moments and output alike, like wrong-dim rows."""
    e = F.col(vec_col)
    return (F.size(e) == dim) & ~F.exists(e, lambda x: x.isNull())


def embedding_moments_exact(
    emb: DataFrame, vec_col: str, dim: int
) -> tuple[int, list, list]:
    """(n, sum_x[dim], sum_xx[upper-triangle packed]) with the sums as
    exact Python Decimals (each addend quantized to DECIMAL(38,18))."""
    e = F.col(vec_col)
    first = F.expr(
        f"transform(sequence(0, {dim - 1}), i -> named_struct("
        f"'idx', i, 'v', cast(cast(element_at({vec_col}, i + 1) as double) "
        f"as {_DEC})))"
    )
    second = F.expr(
        f"flatten(transform(sequence(0, {dim - 1}), i -> "
        f"transform(sequence(i, {dim - 1}), j -> named_struct("
        f"'idx', {dim} + {_pair_index_expr(dim)}, "
        f"'v', cast(cast(element_at({vec_col}, i + 1) as double) * "
        f"cast(element_at({vec_col}, j + 1) as double) as {_DEC})))))"
    )
    from aci_export_spark.llm.dedup import spread_for_explode

    # the explode amplifies each row ~d(d+3)/2× — spread a narrow scan
    # first or the whole moment pass (and its partial aggregation)
    # serializes through the input's split count (one small parquet file
    # = one task, the llm/dedup one-split trap; measured 9.7 s → 0.9 s at
    # sf0.1)
    rows = (
        spread_for_explode(emb.filter(_valid_vec(vec_col, dim)))
        .select(F.explode(F.concat(first, second)).alias("m"))
        .groupBy(F.col("m.idx").alias("idx"))
        .agg(F.sum("m.v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_idx = {int(r["idx"]): r for r in rows}
    if not by_idx:
        raise ValueError(
            f"embedding_moments_exact: no {dim}-dimensional vectors in "
            f"column — nothing to fit"
        )
    n = int(by_idx[0]["c"])
    sum_x = [by_idx[i]["s"] for i in range(dim)]
    n_pairs = dim * (dim + 1) // 2
    sum_xx = [by_idx[dim + p]["s"] for p in range(n_pairs)]
    return n, sum_x, sum_xx


def _covariance_fractions(
    n: int, sum_x: list, sum_xx: list, dim: int
) -> list[list[Fraction]]:
    """cov = sxx/n − μμᵀ in exact rationals (population covariance)."""
    mu = [Fraction(s) / n for s in sum_x]
    cov = [[Fraction(0)] * dim for _ in range(dim)]
    p = 0
    for i in range(dim):
        for j in range(i, dim):
            c = Fraction(sum_xx[p]) / n - mu[i] * mu[j]
            cov[i][j] = c
            cov[j][i] = c
            p += 1
    return cov


def fit_pca_model(
    n: int, sum_x: list, sum_xx: list, dim: int, k: int
) -> tuple[list[float], list[list[float]], list[float]]:
    """(mu, components[k][dim], eigenvalues[k]) from exact moments: exact
    rational covariance -> one correctly-rounded conversion per entry ->
    `np.linalg.eigh` -> top-k descending, sign-canonicalized. Shared by the
    Spark path and the single-process reference — both feed it the SAME
    exact moments, which is the whole point."""
    import numpy as np

    cov_fr = _covariance_fractions(n, sum_x, sum_xx, dim)
    cov = np.array([[float(c) for c in row] for row in cov_fr], dtype=np.float64)
    evals, evecs = np.linalg.eigh(cov)
    order = list(range(dim - 1, dim - 1 - k, -1))
    mu = [float(Fraction(s) / n) for s in sum_x]
    comps: list[list[float]] = []
    lams: list[float] = []
    for c in order:
        v = evecs[:, c].copy()
        a = np.abs(v)
        pivot = int(np.argmax(a))  # first max wins ties (np.argmax contract)
        if v[pivot] < 0:
            v = -v
        lam = float(evals[c])
        if lam <= 0.0:
            raise ValueError(
                f"pca: non-positive eigenvalue {lam} in the top-{k} — "
                "degenerate covariance; reduce k"
            )
        comps.append([float(x) for x in v])
        lams.append(lam)
    return mu, comps, lams


def _project_expr(vec_col: str, mu: list[float], comp: list[float], lam: float) -> str:
    """One whitened component as a left-to-right JVM fold:
    sum_i (x_i - mu_i) * v_i, divided by sqrt(lambda). Literal arrays keep
    the expression size O(dim); every add happens in index order, so the
    reference's plain Python loop replays it exactly."""
    dim = len(mu)
    mu_arr = "array(" + ", ".join(f"cast('{m!r}' as double)" for m in mu) + ")"
    v_arr = "array(" + ", ".join(f"cast('{v!r}' as double)" for v in comp) + ")"
    return (
        f"aggregate(sequence(1, {dim}), cast(0.0 as double), (acc, i) -> "
        f"acc + (cast(element_at({vec_col}, i) as double) - "
        f"element_at({mu_arr}, i)) * element_at({v_arr}, i)) "
        f"/ cast('{lam ** 0.5!r}' as double)"
    )


def pca_whiten(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 4,
) -> DataFrame:
    """Append whitened principal components pc1..pck to `emb` (rows whose
    vector is not `dim`-long or carries a NULL element are dropped — they
    contribute no moments either)."""
    n, sum_x, sum_xx = embedding_moments_exact(emb, vec_col, dim)
    mu, comps, lams = fit_pca_model(n, sum_x, sum_xx, dim, k)
    out = emb.filter(_valid_vec(vec_col, dim))
    for c in range(k):
        out = out.withColumn(
            f"pc{c + 1}", F.expr(_project_expr(vec_col, mu, comps[c], lams[c]))
        )
    return out


def pca_reference_python(
    parquet_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 4,
) -> list[tuple[int, list[float]]]:
    """Single-process reference: pyarrow scan, per-row DECIMAL(38,18)
    quantization of the double products, exact Decimal sums (row-major
    order — irrelevant by exactness, which is the claim under test), the
    shared `fit_pca_model`, and a plain index-order Python loop replaying
    the projection fold. Backs the golden-VALUES oracle of
    `llm_embedding_pca`.

    Quantization parity note: Spark's DOUBLE→DECIMAL cast goes through the
    SHORTEST DECIMAL REPR (Java `BigDecimal.valueOf`), not the exact
    binary expansion — `Decimal(repr(x))`, verified empirically (0.1d
    casts to .100000000000000000, not the exact-expansion .…006). Since
    repr carries ≤17 significant digits, the subsequent scale-18
    quantization is usually a no-op; HALF_UP matches Spark's rounding on
    the rare >18-fraction-digit reprs (tiny |x|)."""
    import decimal

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl[id_col].to_pylist()
    vecs = tbl[vec_col].to_pylist()
    q = decimal.Decimal(1).scaleb(-18)
    zero = decimal.Decimal(0)
    n = 0
    sum_x = [zero] * dim
    n_pairs = dim * (dim + 1) // 2
    sum_xx = [zero] * n_pairs
    kept: list[tuple[int, list[float]]] = []
    for vid, vec in zip(ids, vecs):
        if vec is None or len(vec) != dim or any(v is None for v in vec):
            continue
        x = [float(v) for v in vec]
        kept.append((int(vid), x))
        n += 1
        p = 0
        for i in range(dim):
            sum_x[i] += decimal.Decimal(repr(x[i])).quantize(
                q, rounding=decimal.ROUND_HALF_UP
            )
            for j in range(i, dim):
                sum_xx[p] += decimal.Decimal(repr(x[i] * x[j])).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
                p += 1
    mu, comps, lams = fit_pca_model(n, sum_x, sum_xx, dim, k)
    roots = [lam ** 0.5 for lam in lams]
    out: list[tuple[int, list[float]]] = []
    for vid, x in kept:
        pcs = []
        for c in range(k):
            acc = 0.0
            v = comps[c]
            for i in range(dim):
                acc = acc + (x[i] - mu[i]) * v[i]
            pcs.append(acc / roots[c])
        out.append((vid, pcs))
    return out
