"""Top-k per group (SURVEY.md §2.B W4) — exemplar outliers per cohort."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number window + filter. Spark pushes a per-partition
    top-k (WindowGroupLimit) below the shuffle since 3.5, so each
    map task only ships k rows per group — this stays cheap at scale.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
