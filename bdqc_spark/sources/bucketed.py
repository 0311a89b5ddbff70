"""Spark-native bucketed tables: shuffle-free co-located equi-joins.

The scale story: a fact-to-fact equi-join (decisions back to clips,
train split back to the corpus) shuffles BOTH sides on the key —
at 100 TB that shuffle dominates the job. Spark's bucketing
(``DataFrameWriter.bucketBy`` + ``saveAsTable``) persists each side
pre-hash-partitioned on the join key; when two tables share the same
key and bucket count, Catalyst plans a SortMergeJoin whose children
read bucket-aligned files directly — NO Exchange on either side, at
any data size (output partitioning is reported by the bucketed scan,
so the join's distribution requirement is already satisfied).

Contract (also what the tests pin down):
- same key, same bucket count → zero Exchange in the join plan;
- mismatched bucket counts → Spark falls back to shuffling (at least
  one Exchange reappears) — the join is still correct, just not
  co-located, so table layout is a real design decision;
- results are identical to the plain shuffle join either way.

This module is the managed-table complement to the Iceberg-ish
layer's hash-bucket layout (sources/iceberg.py keeps its own file
format for snapshot semantics; these tables live in the session
warehouse and exist for co-located analytics joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
) -> None:
    """Persist ``df`` as a managed parquet table hash-bucketed (and
    sorted within buckets) by ``key``. Overwrites any previous table
    of the same name (idempotent re-runs)."""
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed tables on ``key``. With matching bucket
    layouts Catalyst plans this with no Exchange (verify with
    ``df.explain()`` — the tests assert it). Broadcast is disabled
    for the join so the co-location is what's exercised, not a
    small-table fallback."""
    left = spark.table(left_table)
    right = spark.table(right_table).hint("shuffle_merge")
    return left.join(right, key, how)
