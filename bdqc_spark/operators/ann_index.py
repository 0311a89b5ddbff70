"""Persistent IVF-PQ ANN index: build once, append, query many.

``ivf_pq_topk`` trains and searches in one plan — right for a one-off
dedup pass, wrong for the serving shape. A production vector index is
TRAINED once (k-means over a bounded sample), its frozen model
(centroids + PQ codebooks — KBs of JSON) and its encoded corpus
((id, cell, codes) — 32×-compressed parquet, partitioned BY CELL) are
persisted, then queried many times and grown incrementally: new
batches encode with the FROZEN codebooks, so existing codes are never
re-encoded (FAISS's add-after-train contract; Jégou et al. 2011).

Layout:
    <dir>/meta.json          model + dims + row count (committed LAST,
                             write-temp-then-rename — a crashed build
                             leaves no readable index)
    <dir>/codes/cell=K/*.parquet   the inverted lists

Scale shape: cell probing at query time is DIRECTORY pruning — the
scan plans only ``cell IN probes`` partitions and never lists, opens
or plans the other inverted lists (asserted on ``inputFiles()`` in
tests); the ADC scoring plan is the shared ``adc_search`` (per-query
LUT as a plan literal, zero Python in scoring). The encode pass is
one pandas-UDF matmul per Arrow batch; the append path is the same
pass + an append-mode parquet write.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

from bdqc_spark.operators.similarity import (
    adc_search,
    train_pq_codebooks,
    train_spherical_centroids,
)

META_VERSION = 1

_ENC_T = StructType(
    [
        StructField("cell", IntegerType()),
        StructField("codes", ArrayType(IntegerType())),
    ]
)


def _encode_udf(cents: np.ndarray, books: np.ndarray):
    """cell + PQ codes for a batch of embeddings under a FROZEN model."""
    cent_t = cents.T.copy()
    m_subspaces, _, d_sub = books.shape

    @pandas_udf(_ENC_T)
    def _enc(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"cell": [], "codes": []})
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(x @ cent_t, axis=1).astype(np.int32)
        codes = np.empty((len(x), m_subspaces), dtype=np.int32)
        for m in range(m_subspaces):
            sub = x[:, m * d_sub : (m + 1) * d_sub]
            d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.DataFrame({"cell": cell, "codes": list(codes)})

    return _enc


def _codes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "codes")


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "meta.json")


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, _meta_path(index_dir))  # commit-last


def _encode_and_write(df: DataFrame, id_col: str, emb_col: str, meta: dict) -> int:
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    enc = _encode_udf(cents, books)
    encoded = df.select(
        F.col(id_col).cast("string").alias("c_id"), enc(F.col(emb_col)).alias("ix")
    ).select("c_id", "ix.cell", "ix.codes")
    encoded.write.mode("append").partitionBy("cell").parquet(_codes_dir(meta["dir"]))
    return df.count()


def build_ann_index(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    dim: int,
    index_dir: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 64,
    sample_size: int = 2000,
    seed: int = 13,
) -> dict:
    """Train the model on a bounded sample, encode the corpus, persist
    both. Returns the committed meta. Refuses to overwrite an
    existing index (delete it explicitly — an index is a dataset)."""
    if os.path.exists(_meta_path(index_dir)):
        raise ValueError(f"index already exists at {index_dir}")
    sample = np.asarray(
        [np.asarray(r[0], dtype=np.float64) for r in df.select(emb_col).limit(sample_size).collect()]
    )
    if sample.size == 0:
        raise ValueError(f"build_ann_index: no vectors in '{emb_col}'")
    if sample.ndim != 2 or sample.shape[1] != dim:
        raise ValueError(f"build_ann_index: expected {dim}-dim vectors, got {sample.shape}")
    nsample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = train_spherical_centroids(nsample, n_centroids, seed)
    books = train_pq_codebooks(nsample, m_subspaces, n_codes, seed=seed)
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "version": META_VERSION,
        "dim": dim,
        "n_centroids": int(cents.shape[0]),
        "m_subspaces": int(books.shape[0]),
        "n_codes": int(books.shape[1]),
        "centroids": cents.tolist(),
        "codebooks": books.tolist(),
        "dir": index_dir,
        "count": 0,
    }
    n = _encode_and_write(df, id_col, emb_col, meta)
    meta["count"] = int(n)
    _write_meta(index_dir, meta)
    return meta


def load_ann_meta(index_dir: str) -> dict:
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    if meta.get("version") != META_VERSION:
        raise ValueError(f"unsupported index version {meta.get('version')}")
    meta["dir"] = index_dir  # the index may have been moved
    return meta


def append_to_ann_index(df: DataFrame, id_col: str, emb_col: str, index_dir: str) -> dict:
    """Encode a new batch with the index's FROZEN model and append its
    codes — existing inverted lists are untouched (add-after-train)."""
    meta = load_ann_meta(index_dir)
    n = _encode_and_write(df, id_col, emb_col, meta)
    meta["count"] = int(meta["count"]) + int(n)
    _write_meta(index_dir, meta)
    return meta


def query_ann_index(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple],
    k: int = 10,
    n_probe: int = 6,
) -> DataFrame:
    """Search the persisted index for [(q_id, vector), ...] — loads
    the KB model, plans a scan of ONLY the probed cell partitions,
    scores with the shared Catalyst ADC plan."""
    meta = load_ann_meta(index_dir)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    indexed = spark.read.parquet(_codes_dir(index_dir))
    return adc_search(indexed, queries, cents, books, k, n_probe)
