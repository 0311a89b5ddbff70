"""Grouped vectorized-UDF operators (SURVEY.md §2.B V3/V4).

The sketch-based fits in operators/stats.py are the 100 TB path;
these exact grouped-pandas variants exist for (a) test-scale exact
statistics, (b) as the engine's `applyInPandas` / grouped-agg UDF
surface — per-cohort custom Python that the built-in aggregates
can't express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def exact_cohort_stats(df: DataFrame, cohort_cols: list[str], value_col: str) -> DataFrame:
    """V3 applyInPandas: exact per-cohort robust stats (numpy median/
    MAD/quantiles on the whole group). One group must fit in one
    worker's memory — fine for cohort-model fitting where cohorts are
    bounded; NOT for unbounded groups (use the sketch path there).
    """
    out_schema = ", ".join(f"{c} string" for c in cohort_cols) + (
        ", n long, median double, mad double, p01 double, p25 double, "
        "p75 double, p99 double, mean double, std double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        med = float(np.median(x)) if x.size else float("nan")
        q = np.quantile(x, [0.01, 0.25, 0.75, 0.99]) if x.size else [float("nan")] * 4
        row = {c: [str(pdf[c].iloc[0])] for c in cohort_cols}
        row.update(
            n=[int(x.size)],
            median=[med],
            mad=[float(np.median(np.abs(x - med))) if x.size else float("nan")],
            p01=[float(q[0])],
            p25=[float(q[1])],
            p75=[float(q[2])],
            p99=[float(q[3])],
            mean=[float(x.mean()) if x.size else float("nan")],
            std=[float(x.std(ddof=1)) if x.size > 1 else float("nan")],
        )
        return pd.DataFrame(row)

    return df.groupBy(*cohort_cols).applyInPandas(fit, out_schema)


@pandas_udf(DoubleType())
def mad_udaf(v: pd.Series) -> float:
    """V4 grouped-agg pandas UDF: exact MAD as an aggregate —
    usable in .agg() and over windows."""
    x = v.to_numpy(dtype=np.float64)
    x = x[~np.isnan(x)]
    if x.size == 0:
        return float("nan")
    return float(np.median(np.abs(x - np.median(x))))


def with_exact_mad(df: DataFrame, cohort_cols: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*cohort_cols).agg(mad_udaf(F.col(value_col)).alias("mad"))
