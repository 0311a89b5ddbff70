"""Multivariate (Mahalanobis) outlier detection — the joint-
distribution complement of the per-attribute robust-z rules.

bdqc's deviation model (lib/BDQC/DataModel/Scalar.pm, reconstructed)
is strictly per-attribute: a file is flagged iff SOME attribute
deviates on its own axis. That misses rows whose attributes are each
individually ordinary but jointly inconsistent — e.g. a long clip
with a short transcript when duration and token count are strongly
correlated in the cohort. The standard fix is the Mahalanobis
distance d² = (x-μ)ᵀ Σ⁻¹ (x-μ), chi-square distributed (df = #attrs)
under the clean multivariate-normal cohort.

Spark shape (the part that matters at 100 TB):
- **Fit** is ONE groupBy(cohort).agg(...) computing counts, sums and
  sums-of-products — map-side partial aggregation, one shuffle of
  KB-sized partials, exactly like the univariate model fit.
- **Invert** happens driver-side on the KB-sized model table (a D×D
  matrix per cohort, D = 4; ridge-regularized so a degenerate cohort
  never produces infinities).
- **Score** is a broadcast join of the per-cohort mean/precision
  scalars followed by a pure-Catalyst quadratic form (D(D+1)/2
  expression terms) — zero Python, zero extra shuffle; the fact
  table is never repartitioned.

This op reports; it does not gate keep/drop (the F1 contract is the
per-attribute rule set the oracle mirrors — this is the deeper
analysis pass a curator runs on what survived).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bdqc_spark.plans.rules import MIN_COHORT_N

# P(chi2_df=4 > 23.51) = 1e-4: on a clean 10^6-row cohort ~100 rows
# flag — a report-tier threshold, deliberately tighter than the
# univariate z=6 rules so the report surfaces only strong joint
# anomalies.
CHI2_4_999 = 23.51


def fit_covariance(
    flat: DataFrame, cohort_cols: list[str], attrs: list[str]
) -> list[dict]:
    """Per-cohort mean vector + covariance matrix via one aggregation
    pass (count / sums / sums-of-products). Rows with ANY null/NaN
    attribute are excluded from the fit (they carry no joint
    evidence). Returns driver-side dicts:
    {cohort..., n, mean: [D], cov: [[DxD]]} — KB-sized."""
    cond = None
    for a in attrs:
        c = F.col(a).isNotNull() & ~F.isnan(F.col(a).cast("double"))
        cond = c if cond is None else (cond & c)
    df = flat.where(cond)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, a in enumerate(attrs):
        aggs.append(F.sum(F.col(a).cast("double")).alias(f"__s_{i}"))
        for j, b in enumerate(attrs):
            if j < i:
                continue
            aggs.append(
                F.sum(F.col(a).cast("double") * F.col(b).cast("double")).alias(
                    f"__sp_{i}_{j}"
                )
            )
    rows = df.groupBy(*cohort_cols).agg(*aggs).collect()
    out = []
    d = len(attrs)
    for r in rows:
        n = r["__n"]
        if n < MIN_COHORT_N:
            continue
        mean = np.array([r[f"__s_{i}"] / n for i in range(d)])
        cov = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                cov[i, j] = cov[j, i] = r[f"__sp_{i}_{j}"] / n - mean[i] * mean[j]
        out.append(
            {
                **{c: r[c] for c in cohort_cols},
                "n": int(n),
                "mean": mean,
                "cov": cov,
            }
        )
    return out


# P(chi2_4 > 13.28) = 0.01 — the trim cut for the reweighted fit
CHI2_4_99 = 13.28


def fit_covariance_trimmed(
    flat: DataFrame,
    cohort_cols: list[str],
    attrs: list[str],
    trim_at: float = CHI2_4_99,
) -> list[dict]:
    """Reweighted (two-pass) covariance fit — the standard defense
    against MASKING: the classical mean/cov estimator includes the
    outliers it is supposed to detect, and a handful of extreme rows
    (e.g. a transcript 40× too long) can inflate the variance enough
    to hide every other anomaly. Pass 1 fits classically; rows whose
    pass-1 d² exceeds the chi2(0.99) cut are dropped; pass 2 refits
    on the survivors (one extra KB-sized aggregation — same shuffle
    shape, twice). This is the one-step reweighted estimator (public
    method: Rousseeuw & van Driessen's MCD reweighting step, 1999 —
    without the subsampling, which a 10^12-row cohort doesn't need)."""
    first = fit_covariance(flat, cohort_cols, attrs)
    if not first:
        return first
    scored = score_mahalanobis(flat, first, cohort_cols, attrs, threshold=trim_at)
    kept = scored.where(F.col("md2").isNull() | (F.col("md2") <= F.lit(trim_at)))
    second = fit_covariance(kept, cohort_cols, attrs)
    return second if second else first


def _precision(cov: np.ndarray) -> np.ndarray:
    """Ridge-regularized inverse: a cohort with a (near-)degenerate
    covariance (constant attribute, collinear pair) still yields a
    finite precision matrix instead of exploding distances."""
    d = cov.shape[0]
    ridge = 1e-9 * max(float(np.trace(cov)) / d, 1e-12)
    while True:
        try:
            return np.linalg.inv(cov + ridge * np.eye(d))
        except np.linalg.LinAlgError:
            ridge *= 10.0
            if ridge > 1e6:
                raise


def score_mahalanobis(
    flat: DataFrame,
    models: list[dict],
    cohort_cols: list[str],
    attrs: list[str],
    threshold: float = CHI2_4_999,
) -> DataFrame:
    """flat + fitted models → per-row `md2` (squared Mahalanobis
    distance) and `mv_outlier` flag. Rows in unmodeled cohorts (below
    MIN_COHORT_N) or with null attributes score NULL and never flag.
    Pure Catalyst after one broadcast join of the per-cohort scalars."""
    if not models:
        return flat.withColumn("md2", F.lit(None).cast("double")).withColumn(
            "mv_outlier", F.lit(False)
        )
    d = len(attrs)
    spark = flat.sparkSession
    wide_rows = []
    for m in models:
        prec = _precision(m["cov"])
        row = {c: m[c] for c in cohort_cols}
        row["__mv_n"] = m["n"]
        for i in range(d):
            row[f"__mu_{i}"] = float(m["mean"][i])
            for j in range(i, d):
                row[f"__pr_{i}_{j}"] = float(prec[i, j])
        wide_rows.append(row)
    wide = spark.createDataFrame(wide_rows)
    joined = flat.join(F.broadcast(wide), on=cohort_cols, how="left")

    diffs = [F.col(attrs[i]).cast("double") - F.col(f"__mu_{i}") for i in range(d)]
    md2 = None
    for i in range(d):
        for j in range(i, d):
            w = F.col(f"__pr_{i}_{j}") * (F.lit(1.0) if i == j else F.lit(2.0))
            term = diffs[i] * diffs[j] * w
            md2 = term if md2 is None else md2 + term
    return (
        joined.withColumn("md2", F.round(md2, 6))
        .withColumn(
            "mv_outlier",
            F.coalesce(
                F.col("__mv_n").isNotNull() & (F.col("md2") > F.lit(threshold)),
                F.lit(False),
            ),
        )
        .drop(*[c for c in joined.columns if c.startswith("__mu_") or c.startswith("__pr_") or c == "__mv_n"])
    )
