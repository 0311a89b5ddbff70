"""Robust statistical modeling operators — the bdqc semantic core.

Reference parity (reconstructed, SURVEY.md §2.A — /root/reference is an
empty mount, so citations are repo paths without line numbers):

- ``fit_numeric_models``    ≙ bdqc DataModel fit for numeric attributes
  (lib/BDQC/DataModel/Scalar.pm: robust center+spread per
  (fileType, attribute)); here one shuffle-aggregated pass per cohort
  plus a second pass for MAD (median absolute deviation), since MAD
  needs the median first.
- ``fit_categorical_models``≙ value-histogram fit for string attributes
  (same module) — rare values are outlier suspects.
- ``score_deviations``      ≙ KB.pm getOutliers: robust z per
  (row, attribute) via a *broadcast* join of the tiny model table back
  onto the big table — map-side only, no shuffle of the fact table.
- ``infer_column_types``    ≙ FileSignature/Tabular.pm per-column type
  inference (int/real/string/empty fractions) that drives model choice.

Scale notes: model fitting shuffles once on the cohort keys with
map-side partial aggregation (Catalyst does partial+final
automatically). The MAD pass joins the per-cohort median back
(broadcast — the model side is |cohorts|×|attrs| rows, KBs) and
re-aggregates; this is the unavoidable second pass of any exact-ish
robust spread. At 100 TB the fact table is never shuffled more than
these two aggregation passes, and scoring is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Consistency constant making MAD comparable to a stddev for
# normally distributed data (1/Phi^-1(3/4)).
MAD_TO_SIGMA = 1.4826


def fit_numeric_models(
    df: DataFrame,
    cohort_cols: list[str],
    attr_cols: list[str],
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per (cohort, attribute): n, median, MAD, p01/p25/p75/p99, mean, std.

    Long-form output: one row per (cohort, attribute) — the shape of
    bdqc's collated models, and what `score_deviations` broadcasts.

    `exact=True` uses `median`/`percentile` (exact, for oracle-checked
    tests); default uses `percentile_approx` (mergeable sketch, the
    100 TB path).

    Execution shape: the fact table is aggregated WIDE (all
    attributes in one groupBy pass — one scan, one shuffle), and the
    tiny per-cohort result is unpivoted to long form afterwards.
    Melting before aggregating would multiply the shuffled/scanned
    row count by |attrs| for zero benefit.

    The whole plan is ONE parameterized spark.sql() call: building it
    expression-by-expression costs ~200 py4j round trips (~1s of
    driver time, measured) — pure serial cost paid on every pipeline
    run at every cluster size; a single SQL string parses JVM-side in
    one trip. The physical plan is identical.
    """
    if exact:
        pct = lambda c, p: f"percentile({c}, {p})"  # noqa: E731
    else:
        pct = lambda c, p: f"percentile_approx({c}, {p}, {accuracy})"  # noqa: E731

    cohorts = ", ".join(f"`{c}`" for c in cohort_cols)
    cast_cols = ", ".join(f"CAST(`{c}` AS DOUBLE) AS `{c}`" for c in attr_cols)
    wide_aggs = ",\n    ".join(
        f"COUNT(`{c}`) AS `{c}__n`, "
        f"{pct(f'`{c}`', 0.5)} AS `{c}__median`, "
        f"{pct(f'`{c}`', 0.01)} AS `{c}__p01`, "
        f"{pct(f'`{c}`', 0.25)} AS `{c}__p25`, "
        f"{pct(f'`{c}`', 0.75)} AS `{c}__p75`, "
        f"{pct(f'`{c}`', 0.99)} AS `{c}__p99`, "
        f"AVG(`{c}`) AS `{c}__mean`, "
        f"STDDEV_SAMP(`{c}`) AS `{c}__std`"
        for c in attr_cols
    )
    # Pass 2: MAD needs |x − median| per row → broadcast the medians
    # back (tiny) and aggregate wide again.
    med_cols = ", ".join(f"`{c}__median` AS `{c}__med`" for c in attr_cols)
    mad_aggs = ", ".join(
        f"{pct(f'abs(c.`{a}` - m.`{a}__med`)', 0.5)} AS `{a}__mad`" for a in attr_cols
    )
    stats = ["n", "median", "mad", "p01", "p25", "p75", "p99", "mean", "std"]
    stack_rows = ", ".join(
        "'" + c + "', " + ", ".join(f"`{c}__{s}`" for s in stats) for c in attr_cols
    )
    query = f"""
WITH casted AS (SELECT {cohorts}, {cast_cols} FROM {{df}}),
wide AS (SELECT {cohorts}, {wide_aggs} FROM casted GROUP BY {cohorts}),
mads AS (
  SELECT /*+ BROADCAST(m) */ {', '.join('c.`' + k + '`' for k in cohort_cols)}, {mad_aggs}
  FROM casted c JOIN (SELECT {cohorts}, {med_cols} FROM wide) m USING ({cohorts})
  GROUP BY {', '.join('c.`' + k + '`' for k in cohort_cols)}
)
SELECT * FROM (
  SELECT {cohorts},
         stack({len(attr_cols)}, {stack_rows}) AS (attribute, {', '.join(stats)})
  FROM wide JOIN mads USING ({cohorts})
) WHERE n > 0
"""
    return df.sparkSession.sql(query, df=df)


def fit_categorical_models(
    df: DataFrame,
    cohort_cols: list[str],
    attr_col: str,
    rare_frac: float = 0.01,
) -> DataFrame:
    """Per cohort: value histogram of `attr_col` + rare-value flags.

    One row per (cohort, value) with count, frac, is_rare — bdqc's
    categorical DataModel (rare/unique values are deviation suspects).
    """
    counts = df.groupBy(*cohort_cols, attr_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy(*cohort_cols).agg(F.sum("cnt").alias("total"))
    return (
        counts.join(F.broadcast(totals), on=list(cohort_cols))
        .withColumn("frac", F.col("cnt") / F.col("total"))
        .withColumn("is_rare", F.col("frac") < F.lit(rare_frac))
    )


def score_deviations(
    df: DataFrame,
    models: DataFrame,
    cohort_cols: list[str],
    attr_cols: list[str],
    z_threshold: float = 4.0,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Robust z-score every attribute against its cohort model.

    Output: df's id/cohort cols + per-attr `<attr>_z` columns +
    `rule_hits: array<string>` (sorted, deterministic) +
    `keep = (no hits)` — bdqc's per-file deviation list + flag
    (KB.pm getOutliers/showOutliers), expressed as one broadcast
    join + pure column arithmetic (zero shuffles on `df`).
    """
    id_cols = id_cols or []
    # Pivot the long model table to wide (median_<a>, mad_<a>) — tiny.
    wide = models.groupBy(*cohort_cols).pivot("attribute", attr_cols).agg(
        F.first("median").alias("median"), F.first("mad").alias("mad")
    )
    scored = df.join(F.broadcast(wide), on=list(cohort_cols), how="left")
    hit_exprs = []
    for a in attr_cols:
        med, mad = F.col(f"{a}_median"), F.col(f"{a}_mad")
        # Degenerate spread (mad=0): fall back to exact-match test —
        # any deviation from the median is a hit (bdqc flags any
        # deviation when the cohort is constant).
        z = F.when(mad > 0, F.abs(F.col(a) - med) / (F.lit(MAD_TO_SIGMA) * mad)).otherwise(
            F.when(F.col(a) == med, F.lit(0.0)).otherwise(F.lit(float("inf")))
        )
        scored = scored.withColumn(f"{a}_z", z)
        hit_exprs.append(
            F.when(F.col(f"{a}_z") > F.lit(z_threshold), F.lit(f"robust_z:{a}")).otherwise(F.lit(None))
        )
    scored = scored.withColumn(
        "rule_hits", F.array_sort(F.filter(F.array(*hit_exprs), lambda x: x.isNotNull()))
    ).withColumn("keep", F.size("rule_hits") == 0)
    keep_cols = [*id_cols, *cohort_cols, *[f"{a}_z" for a in attr_cols], "rule_hits", "keep"]
    return scored.select(*keep_cols)


def infer_column_types(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column observed type profile (bdqc Tabular.pm inference).

    For every column: n, n_null, n_empty, frac_int_like, frac_num_like,
    n_distinct (approx), inferred ∈ {empty,int,real,categorical,text}.
    Single aggregation pass over the table (all columns at once).
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.sum(F.when(F.trim(s) == "", 1).otherwise(0)).alias(f"{c}__n_empty"),
            F.sum(F.when(s.rlike(r"^-?\d+$"), 1).otherwise(0)).alias(f"{c}__n_int"),
            F.sum(F.when(s.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), 1).otherwise(0)).alias(f"{c}__n_num"),
            F.approx_count_distinct(c).alias(f"{c}__n_distinct"),
            F.avg(F.length(s)).alias(f"{c}__avg_len"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    spark = df.sparkSession
    out = []
    for c in columns:
        n = row[f"{c}__n"]
        n_null, n_empty = row[f"{c}__n_null"], row[f"{c}__n_empty"]
        n_val = max(n - n_null, 1)
        fi, fn = row[f"{c}__n_int"] / n_val, row[f"{c}__n_num"] / n_val
        nd = row[f"{c}__n_distinct"]
        if n_null + n_empty == n:
            inferred = "empty"
        elif fi > 0.99:
            inferred = "int"
        elif fn > 0.99:
            inferred = "real"
        elif nd <= max(20, 0.02 * n):
            inferred = "categorical"
        else:
            inferred = "text"
        out.append(
            (c, n, n_null, n_empty, float(fi), float(fn), nd, float(row[f"{c}__avg_len"] or 0.0), inferred)
        )
    return spark.createDataFrame(
        out,
        "column string, n long, n_null long, n_empty long, frac_int_like double, "
        "frac_num_like double, n_distinct long, avg_len double, inferred string",
    )
