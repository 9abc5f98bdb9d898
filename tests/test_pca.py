"""PCA whitening (llm/pca.py): whitening contract (unit variance,
decorrelation), agreement with a plain numpy PCA, exact-moment permutation
invariance, and the degenerate-eigenvalue guard."""

from __future__ import annotations

import numpy as np
import pytest

from aci_export_spark.llm.pca import (
    embedding_moments_exact,
    fit_pca_model,
    pca_whiten,
)

DIM, K = 8, 3


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id bigint, embedding array<float>",
    )


def _sample(n=400, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: distinct variances per latent axis so the top-K is stable
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    X = (rng.standard_normal((n, DIM)) * scales).astype(np.float32)
    return X


def test_whitened_components_have_unit_variance_and_are_uncorrelated(spark):
    X = _sample()
    out = pca_whiten(_emb_df(spark, X), dim=DIM, k=K).toPandas()
    P = out[[f"pc{c + 1}" for c in range(K)]].to_numpy()
    cov = np.cov(P, rowvar=False, bias=True)
    assert np.allclose(np.diag(cov), 1.0, atol=1e-6)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6


def test_matches_plain_numpy_pca(spark):
    """Same projections (up to the documented sign canon) as a float64
    numpy PCA computed with none of the exact-decimal machinery."""
    X = _sample(seed=11)
    out = (
        pca_whiten(_emb_df(spark, X), dim=DIM, k=K)
        .toPandas()
        .sort_values("vec_id")
    )
    P = out[[f"pc{c + 1}" for c in range(K)]].to_numpy()
    Xd = X.astype(np.float64)
    mu = Xd.mean(axis=0)
    cov = np.cov(Xd, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    ref = np.empty_like(P)
    for c in range(K):
        v = evecs[:, DIM - 1 - c]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        ref[:, c] = (Xd - mu) @ v / np.sqrt(evals[DIM - 1 - c])
    assert np.allclose(P, ref, atol=1e-8)


def test_moments_are_row_order_invariant(spark):
    """The exactness claim itself: permuting rows changes float-sum order
    everywhere, but the decimal moments are identical."""
    X = _sample(n=100, seed=3)
    n1, sx1, sxx1 = embedding_moments_exact(_emb_df(spark, X), "embedding", DIM)
    n2, sx2, sxx2 = embedding_moments_exact(
        _emb_df(spark, X[::-1].copy()).repartition(7), "embedding", DIM
    )
    assert (n1, sx1, sxx1) == (n2, sx2, sxx2)


def test_wrong_dimension_rows_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * DIM), (2, [1.0] * (DIM - 1)), (3, [2.0] * DIM),
         (4, [0.5] * DIM), (5, [3.0] * DIM)],
        "vec_id bigint, embedding array<float>",
    )
    out = pca_whiten(df, dim=DIM, k=1)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3, 4, 5]


def test_degenerate_covariance_raises(spark):
    """All-identical vectors: every eigenvalue is 0 — the guard must fire
    rather than divide by zero."""
    X = np.ones((20, DIM), dtype=np.float32)
    with pytest.raises(Exception, match="non-positive eigenvalue"):
        pca_whiten(_emb_df(spark, X), dim=DIM, k=1).collect()


def test_no_valid_vectors_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no 8-dimensional vectors"):
        pca_whiten(df, dim=DIM, k=1)
