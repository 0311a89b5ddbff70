"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k via a join + window.
  Correct baseline; the oracle-checked variant lives in
  __spark_entry__.q_similarity_topk.
- ``ann_lsh_topk``: random-hyperplane LSH (SimHash-for-vectors).
  Queries only compare against candidates in the same hyperplane
  sign bucket → the cross-join shrinks by ~2^n_planes. This is the
  scale path: at corpus scale the bucket join is an equi-join
  (shuffle on bucket id), never an all-pairs product.

Hyperplanes are deterministic (seeded numpy), inlined as array
literals → the whole operator is Catalyst expressions, no UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_lit(emb_col, plane: np.ndarray):
    arr = F.array(*[F.lit(float(v)) for v in plane])
    return F.aggregate(
        F.zip_with(emb_col, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (n(a) * n(b))


def brute_force_topk(
    df: DataFrame, id_col: str, emb_col: str, k: int, query_filter: str
) -> DataFrame:
    q = df.where(query_filter).select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))
    c = df.select(F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb"))
    scored = q.join(c, F.col("q_id") != F.col("c_id")).withColumn(
        "cosine", F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", "rk")
    )


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    k: int,
    n_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
    query_filter: str = "true",
) -> DataFrame:
    """Approximate top-k: candidates share the full hyperplane-sign
    bucket. Trade recall for a 2^n_planes candidate reduction."""
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket(col):
        b = F.lit(0).cast("long")
        for i in range(n_planes):
            bit = F.when(_dot_lit(col, planes[i]) > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            b = b.bitwiseOR(F.shiftleft(bit, i))
        return b

    with_bucket = df.select(
        F.col(id_col).alias("_id"), F.col(emb_col).alias("_emb"), bucket(F.col(emb_col)).alias("_bkt")
    )
    # Filter queries via semi-join on the original predicate.
    qids = df.where(query_filter).select(F.col(id_col).alias("_id"))
    q = with_bucket.join(F.broadcast(qids), "_id", "left_semi").select(
        F.col("_id").alias("q_id"), F.col("_emb").alias("q_emb"), F.col("_bkt").alias("bkt")
    )
    c = with_bucket.select(
        F.col("_id").alias("c_id"), F.col("_emb").alias("c_emb"), F.col("_bkt").alias("bkt")
    )
    scored = (
        q.join(c, on="bkt")
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", F.round(_cosine(F.col("q_emb"), F.col("c_emb")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", "rk")
    )
