"""PCA fit/project/whiten: numpy parity, whitened covariance,
partition-invariance of the fitted model."""

import numpy as np
import pytest

from distributed_vector_database_spark.operators.pca import (
    pca_fit,
    pca_project,
    whiten_evidence,
)


def _synth(spark, n=500, d=8, parts=7):
    rng = np.random.default_rng(42)
    # anisotropic gaussian: distinct eigenvalues so components are stable
    scales = np.array([10.0, 6.0, 3.5, 2.0, 1.2, 0.7, 0.4, 0.2])
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d) * 5
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, embedding array<double>")
        .repartition(parts),
        x,
    )


def test_pca_fit_matches_numpy(spark):
    df, x = _synth(spark)
    model = pca_fit(df, k=4)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    np.testing.assert_allclose(model["mean"], x.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(
        model["eigenvalues"], evals[order], rtol=1e-9
    )
    for i, col in enumerate(order):
        v = evecs[:, col]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        np.testing.assert_allclose(model["components"][i], v, atol=1e-9)
    # explained ratios sum to <= 1 and are descending
    e = model["explained"]
    assert all(e[i] >= e[i + 1] for i in range(len(e) - 1))
    assert 0 < sum(e) <= 1 + 1e-12


def test_pca_project_matches_numpy(spark):
    df, x = _synth(spark)
    model = pca_fit(df, k=3)
    got = {
        r.id: np.array(r.proj)
        for r in pca_project(df, model, out_col="proj").collect()
    }
    c = np.array(model["components"])
    mu = np.array(model["mean"])
    for i in range(0, 500, 97):
        np.testing.assert_allclose(got[i], c @ (x[i] - mu), atol=1e-9)


def test_whitened_projection_has_identity_covariance(spark):
    df, _ = _synth(spark)
    model = pca_fit(df, k=4)
    proj = np.array(
        [r.proj for r in pca_project(df, model, whiten=True).collect()]
    )
    cov = np.cov(proj, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, np.eye(4), atol=1e-6)


def test_fit_is_partition_invariant(spark):
    df1, _ = _synth(spark, parts=1)
    df13, _ = _synth(spark, parts=13)
    m1 = pca_fit(df1, k=2)
    m13 = pca_fit(df13, k=2)
    np.testing.assert_allclose(m1["mean"], m13["mean"], atol=1e-9)
    np.testing.assert_allclose(
        m1["components"], m13["components"], atol=1e-7
    )


def test_whiten_evidence_zero_on_correct_model(spark):
    df, _ = _synth(spark)
    model = pca_fit(df, k=4)
    proj = pca_project(df, model, whiten=True)
    row = whiten_evidence(proj, model).collect()[0]
    assert row.cov_identity_err == 0.0
    assert row.recon_err == 0.0


def test_whiten_evidence_catches_broken_model(spark):
    # a corrupted eigenvalue must surface as nonzero error in BOTH
    # evidence columns — the whitened variance drifts off 1 and the
    # Pythagoras residual identity breaks
    df, _ = _synth(spark)
    model = pca_fit(df, k=4)
    broken = dict(model)
    broken["eigenvalues"] = [v * 4.0 for v in model["eigenvalues"]]
    proj = pca_project(df, broken, whiten=True)
    row = whiten_evidence(proj, broken).collect()[0]
    assert row.cov_identity_err > 0.1
    assert row.recon_err > 0.0


def test_fit_raises_on_empty(spark):
    df = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(df)
