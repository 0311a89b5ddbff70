"""Embedding PCA / whitening (operators/pca.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.operators.pca import fit_pca, project_pca

DIM = 16


def _data(n=400, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: variance concentrated in a few random directions
    basis = np.linalg.qr(rng.standard_normal((DIM, DIM)))[0]
    scales = np.array([8, 5, 3, 1.5] + [0.3] * (DIM - 4))
    return rng.standard_normal((n, DIM)) * scales @ basis.T + rng.normal(size=DIM)


@pytest.fixture(scope="module")
def vecs():
    return _data()


@pytest.fixture(scope="module")
def df(spark, vecs):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [str(i) for i in range(len(vecs))],
             "embedding": [list(map(float, v)) for v in vecs]}
        )
    ).repartition(7)  # partials must combine across partitions


def test_fit_matches_numpy(spark, vecs, df):
    m = fit_pca(df, "embedding", DIM, k=4)
    assert m["n"] == len(vecs)
    np.testing.assert_allclose(m["mean"], vecs.mean(axis=0), atol=1e-9)
    cov = np.cov(vecs.T, bias=True)
    w, v = np.linalg.eigh(cov)
    top = np.sort(w)[::-1][:4]
    np.testing.assert_allclose(np.sort(m["eigvals"])[::-1], top, rtol=1e-9)
    # components span the same subspace as numpy's top-4 eigvecs
    nv = v[:, np.argsort(w)[::-1][:4]]
    overlap = np.abs(m["components"].T @ nv)
    np.testing.assert_allclose(np.sort(np.max(overlap, axis=1)), np.ones(4), atol=1e-6)
    assert 0.9 <= m["var_explained"] <= 1.0  # 4 big axes dominate by design


def test_fit_deterministic_across_partitionings(spark, df):
    a = fit_pca(df, "embedding", DIM, k=3)
    b = fit_pca(df.repartition(2), "embedding", DIM, k=3)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-9)


def test_projection_matches_numpy_and_whitening(spark, vecs, df):
    m = fit_pca(df, "embedding", DIM, k=4)
    out = project_pca(df, "embedding", m, whiten=False).orderBy("vec_id").toPandas()
    ids = out.vec_id.astype(int).to_numpy()
    got = np.asarray(list(out.pca))
    want = (vecs[ids] - m["mean"]) @ m["components"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # whitened coordinates have ~unit variance
    w = project_pca(df, "embedding", m, whiten=True).toPandas()
    gw = np.asarray(list(w.pca))
    np.testing.assert_allclose(gw.var(axis=0), np.ones(4), rtol=0.05)


def test_projection_preserves_neighbors(spark):
    # clustered data: the 4-dim projection keeps cluster identity
    rng = np.random.default_rng(11)
    centers = rng.normal(scale=6.0, size=(6, DIM))
    vecs = np.concatenate([c + rng.normal(scale=0.4, size=(40, DIM)) for c in centers])
    labels = np.repeat(np.arange(6), 40)
    import pandas as pd

    sdf = (
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
        .createDataFrame(
            pd.DataFrame(
                {"vec_id": [str(i) for i in range(len(vecs))],
                 "embedding": [list(map(float, v)) for v in vecs]}
            )
        )
    )
    m = fit_pca(sdf, "embedding", DIM, k=4)
    proj = (vecs - m["mean"]) @ m["components"]
    # nearest centroid in projected space recovers the label
    pc = np.stack([proj[labels == j].mean(axis=0) for j in range(6)])
    pred = np.argmin(((proj[:, None, :] - pc[None]) ** 2).sum(-1), axis=1)
    assert (pred == labels).mean() >= 0.99


def test_guards(spark, df):
    with pytest.raises(ValueError, match="k <= dim"):
        fit_pca(df, "embedding", DIM, k=DIM + 1)
    with pytest.raises(Exception, match="expected"):
        fit_pca(df, "embedding", DIM + 2, k=2)
