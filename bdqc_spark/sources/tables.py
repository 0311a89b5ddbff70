"""Parquet table scan helpers (SURVEY.md §2.B S1).

The scan is the operator Catalyst optimizes hardest: predicate
pushdown and column pruning happen automatically *as long as* the
program keeps filters/projections expressible (no UDF-wrapped
predicates in front of the scan). These helpers only centralize
paths and view registration — the plan stays fully declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's fixture tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
