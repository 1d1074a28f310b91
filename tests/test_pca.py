"""Distributed PCA: numpy parity, refit determinism under repartition,
the residual-equals-trailing-eigenvalues identity, and orthonormality."""

import numpy as np
import pytest


def _data(n=300, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so the spectrum is interesting
    A = rng.normal(size=(dim, dim))
    A[:, :3] *= 5.0
    return rng.normal(size=(n, dim)) @ A.T * 0.1


def _qdf(spark, X):
    from wavelet_decomposition_spark.operators.kmeans import quantized

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    return quantized(df)


@pytest.fixture(scope="module")
def fitted(spark):
    from wavelet_decomposition_spark.operators.pca import pca_fit

    X = _data()
    q = _qdf(spark, X)
    return X, q, pca_fit(q, n_components=5)


def test_matches_numpy_covariance_eigh(fitted):
    X, q, fit = fitted
    Xq = np.floor(X * 1e6) / 1e6  # what the engine actually fit
    cov = np.cov(Xq.T, bias=True)
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(fit["eigenvalues"], ref, rtol=1e-9, atol=1e-12)
    # top component spans the same direction (sign-pinned)
    _, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    got = fit["components"][0]
    assert abs(abs(top @ got) - 1.0) < 1e-9


def test_refit_bit_identical_under_repartition(spark, fitted):
    from wavelet_decomposition_spark.operators.pca import pca_fit

    X, q, fit = fitted
    refit = pca_fit(q.repartition(7), n_components=5)
    assert np.array_equal(fit["eigenvalues"], refit["eigenvalues"])
    assert np.array_equal(fit["components"], refit["components"])
    assert np.array_equal(fit["mean"], refit["mean"])


def test_orthonormal_components(fitted):
    _, _, fit = fitted
    C = fit["components"]
    assert np.abs(C @ C.T - np.eye(len(C))).max() < 1e-10


def test_residual_equals_trailing_eigenvalue_mass(spark, fitted):
    from pyspark.sql import functions as F

    from wavelet_decomposition_spark.operators.pca import pca_project

    X, q, fit = fitted
    # project the SAME (quantized, descaled) data the fit saw
    emb = q.withColumn(
        "embedding", F.transform("embedding", lambda v: v / F.lit(1e6))
    )
    proj = pca_project(emb, fit["mean"], fit["components"])
    got = proj.agg(F.avg("resid_sq")).first()[0]
    want = fit["eigenvalues"][len(fit["components"]):].sum()
    assert abs(got - want) <= 1e-9 * max(want, 1e-30)


def test_scores_match_numpy(spark, fitted):
    from pyspark.sql import functions as F

    from wavelet_decomposition_spark.operators.pca import pca_project

    X, q, fit = fitted
    emb = q.withColumn(
        "embedding", F.transform("embedding", lambda v: v / F.lit(1e6))
    )
    rows = {
        r.vec_id: np.array(r.scores)
        for r in pca_project(emb, fit["mean"], fit["components"]).collect()
    }
    Xq = np.floor(X * 1e6) / 1e6
    ref = (Xq - fit["mean"]) @ fit["components"].T
    for i in range(0, len(X), 29):
        assert np.allclose(rows[i], ref[i], rtol=1e-9, atol=1e-12)


def test_empty_input_raises(spark):
    from wavelet_decomposition_spark.operators.pca import pca_fit

    empty = spark.createDataFrame([], "vec_id long, embedding array<bigint>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty)
