"""Persistent IVF-PQ index (operators/ann_index.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.ann_index import (
    append_to_ann_index,
    build_ann_index,
    load_ann_meta,
    query_ann_index,
)

DIM = 32


def _vecs(seed=17, n_centers=8, per=30):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=5.0, size=(n_centers, DIM))
    return np.concatenate([c + rng.normal(scale=0.3, size=(per, DIM)) for c in centers])


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _vecs()
    pdf = pd.DataFrame(
        {"vec_id": [str(i) for i in range(len(vecs))],
         "embedding": [list(map(float, v)) for v in vecs]}
    )
    return vecs, spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    _, df = corpus
    d = str(tmp_path_factory.mktemp("ann") / "ix")
    meta = build_ann_index(
        df, "vec_id", "embedding", DIM, d,
        n_centroids=16, m_subspaces=8, n_codes=32, sample_size=240,
    )
    assert meta["count"] == 240
    return d


def test_meta_roundtrip_and_guards(spark, corpus, index_dir, tmp_path):
    meta = load_ann_meta(index_dir)
    assert np.asarray(meta["centroids"]).shape == (16, DIM)
    assert np.asarray(meta["codebooks"]).shape == (8, 32, DIM // 8)
    with pytest.raises(ValueError, match="already exists"):
        build_ann_index(corpus[1], "vec_id", "embedding", DIM, index_dir)
    with pytest.raises(ValueError, match="expected"):
        build_ann_index(corpus[1], "vec_id", "embedding", DIM + 1, str(tmp_path / "x"))


def test_query_recall_and_partition_pruning(spark, corpus, index_dir):
    vecs, _ = corpus
    nvec = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = [(str(i), vecs[i]) for i in range(0, 100, 10)]
    out = query_ann_index(spark, index_dir, queries, k=10, n_probe=4)
    # cell probing is DIRECTORY pruning: each per-query scan carries a
    # `cell IN (...)` PartitionFilter, so only the probed inverted
    # lists are listed/planned (inputFiles() reports the relation's
    # full listing, so the plan — not it — is the evidence)
    single = query_ann_index(spark, index_dir, queries[:1], k=10, n_probe=4)
    plan = single._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan, plan
    import re

    pf = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)", plan)
    assert pf is not None and len(pf.group(1).split(",")) == 4, plan
    pdf = out.toPandas()
    assert (pdf.groupby("q_id").size() <= 10).all()
    hits = []
    for q_id, grp in pdf.groupby("q_id"):
        i = int(q_id)
        d2 = ((nvec - nvec[i][None, :]) ** 2).sum(axis=1)
        d2[i] = np.inf
        hits.append(str(np.argmin(d2)) in set(grp.c_id))
    assert np.mean(hits) >= 0.8, hits


def test_append_frozen_model_finds_new_vectors(spark, corpus, index_dir):
    vecs, _ = corpus
    # plant near-duplicates of vector 5 as a NEW batch
    twin = vecs[5] + 0.01
    new = spark.createDataFrame(
        pd.DataFrame({"vec_id": ["new-a", "new-b"],
                      "embedding": [list(map(float, twin)), list(map(float, twin + 0.01))]})
    )
    meta = append_to_ann_index(new, "vec_id", "embedding", index_dir)
    assert meta["count"] == 242
    out = query_ann_index(spark, index_dir, [("q5", vecs[5])], k=5, n_probe=4).toPandas()
    assert "new-a" in set(out.c_id) and "new-b" in set(out.c_id)
    # the appended twins rank at the top alongside vector 5 itself
    # (which is in the corpus and equally close to its own query)
    top3 = set(out.sort_values("adc_dist").head(3).c_id)
    assert top3 == {"5", "new-a", "new-b"}


def test_query_matches_inplan_operator_shape(spark, corpus, index_dir):
    """The persisted path reuses the exact adc_search plan: scores for
    the same query against the same codes must be identical whether
    the codes come from the parquet index or a live DataFrame."""
    vecs, _ = corpus
    meta = load_ann_meta(index_dir)
    from bdqc_spark.operators.similarity import adc_search

    indexed = spark.read.parquet(f"{index_dir}/codes")
    q = [("q7", vecs[7])]
    a = query_ann_index(spark, index_dir, q, k=10, n_probe=4).toPandas()
    b = adc_search(
        indexed,
        q,
        np.asarray(meta["centroids"]),
        np.asarray(meta["codebooks"]),
        10,
        4,
    ).toPandas()
    pa = a.sort_values(["q_id", "rk"]).reset_index(drop=True)
    pb = b.sort_values(["q_id", "rk"]).reset_index(drop=True)
    assert pa.equals(pb)
