"""Embedding PCA / whitening — the preprocessing stage in front of
ANN and SemDeDup (FAISS's OPQ/PCAMatrix pretransforms, Jégou et al.;
Abbas et al. 2023 run SemDeDup on reduced embeddings).

Fit is EXACT over the full corpus, not sampled: each partition
reduces its vectors to (n, Σx, ΣxxT) inside one mapInPandas pass —
a few KB per partition regardless of row count — and the driver
combines the partials and eigendecomposes the d×d covariance
(d ≤ a few hundred for embedding columns; the cube of that is
microseconds). That is the classic map-side-combine moment fit, the
same bounded-model contract as operators/multivariate.py.

Projection is one vectorized pandas-UDF matmul per Arrow batch with
the (d×k) component matrix broadcast as a closure constant — a pure
map pass at any scale. Sign convention: each component's
largest-|loading| coordinate is made positive, so the fit is
deterministic across partitionings and re-runs.

Whitening divides each projected coordinate by sqrt(eigenvalue), the
standard PCA-whitening transform (unit variance per component).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType


def fit_pca(df: DataFrame, emb_col: str, dim: int, k: int) -> dict:
    """Exact corpus PCA: returns {mean (d,), components (d,k),
    eigvals (k,), var_explained (float), n (int)}."""
    if not 1 <= k <= dim:
        raise ValueError(f"fit_pca: need 1 <= k <= dim, got k={k} dim={dim}")

    def partials(batches):
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in batches:
            for v in pdf[emb_col]:
                if v is None:
                    continue
                x = np.asarray(v, dtype=np.float64)
                if x.shape != (dim,):
                    raise ValueError(f"fit_pca: expected {dim}-dim vectors, got {x.shape}")
                n += 1
                s += x
                ss += np.outer(x, x)
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )

    # one KB-sized row per partition; the collect is bounded by the
    # partition count, never the row count
    parts = df.select(emb_col).mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 vectors")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    eigvals = np.maximum(eigvals[order], 0.0)
    comps = eigvecs[:, order]
    # deterministic sign: largest-|loading| coordinate positive
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    total = float(np.trace(cov))
    return {
        "mean": mean,
        "components": comps,
        "eigvals": eigvals,
        "var_explained": float(eigvals.sum() / total) if total > 0 else 1.0,
        "n": int(n),
    }


def project_pca(
    df: DataFrame, emb_col: str, model: dict, out_col: str = "pca", whiten: bool = False
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection (optionally
    whitened). One vectorized matmul per Arrow batch; the (d×k)
    model rides the closure (KBs)."""
    mean = model["mean"]
    comps = model["components"]
    if whiten:
        comps = comps / np.sqrt(np.maximum(model["eigvals"], 1e-12))[None, :]

    @pandas_udf(ArrayType(FloatType()))
    def _proj(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        y = (x - mean[None, :]) @ comps
        return pd.Series(list(y.astype(np.float32)))

    return df.withColumn(out_col, _proj(F.col(emb_col)))
