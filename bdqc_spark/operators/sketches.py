"""Mergeable sketch state: incremental corpus statistics without
rescans (Apache DataSketches via Spark 4's built-in hll_*/theta_*/
kll_* aggregates — JVM-side, zero Python).

The 100-TB problem these solve: "how many distinct transcripts /
speakers / tokens does the corpus hold, and how many NEW ones did
today's batch add?" computed exactly needs a corpus-wide distinct
shuffle per question per day. Sketches invert the cost model:

- each APPEND BATCH is summarized once, at write time, into a
  KB-sized sketch state row per group (map-side partial aggregation —
  the sketch aggregate combines per-partition, so the shuffle carries
  sketch bytes, not keys);
- corpus-wide answers are a UNION over the per-batch states —
  thousands of batches merge in milliseconds, no data file is
  re-opened;
- batch novelty (distinct items never seen before — the metric that
  drives dedup scheduling and crawl steering) is a THETA set
  difference between the batch sketch and the merged history sketch,
  again metadata-only.

Estimates carry DataSketches' published error bounds (HLL lgK=12 →
~1.6% RSE; theta default k → ~2%; KLL k=200 → ~1.3% rank error);
tests gate at 5%. State rows round-trip through parquet (binary
columns), so sketch state persists next to the table's metadata the
same way manifests do.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sketch_batch", "merge_states", "estimate_state", "batch_novelty"]


def sketch_batch(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Summarize one batch into per-group sketch state: HLL + theta
    sketches of ``distinct_col`` (HLL is smaller / monotone-union,
    theta additionally supports set difference for novelty), a KLL
    quantile sketch of ``value_col`` (if given), and the exact row
    count. One partial-aggregated shuffle of sketch bytes."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.hll_sketch_agg(distinct_col).alias("hll"),
        F.theta_sketch_agg(distinct_col).alias("theta"),
    ]
    if value_col is not None:
        aggs.append(
            F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("kll")
        )
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def merge_states(states: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Union per-batch sketch states into one corpus state. Sketch
    unions are associative and idempotent-safe only across DISTINCT
    batches — the caller owns not merging a batch twice (same
    contract as Iceberg manifest accounting). Runs on the KB-sized
    state rows: cost is independent of corpus size."""
    if not states:
        raise ValueError("merge_states needs at least one state")
    df = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.hll_union_agg("hll").alias("hll"),
        F.theta_union_agg("theta").alias("theta"),
    ]
    if "kll" in df.columns:
        aggs.append(F.kll_merge_agg_double("kll").alias("kll"))
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def estimate_state(state: DataFrame, quantiles: tuple[float, ...] = (0.5,)) -> DataFrame:
    """Materialize the human-readable answers from a sketch state:
    distinct estimates (both sketch families) and KLL quantiles."""
    cols = [c for c in state.columns if c not in ("n_rows", "hll", "theta", "kll")]
    out = [
        *cols,
        F.col("n_rows"),
        F.hll_sketch_estimate("hll").alias("hll_distinct"),
        F.round(F.theta_sketch_estimate("theta")).cast("long").alias("theta_distinct"),
    ]
    if "kll" in state.columns:
        for q in quantiles:
            out.append(
                F.kll_sketch_get_quantile_double("kll", F.lit(float(q))).alias(
                    f"q{int(round(q * 100)):02d}"
                )
            )
    return state.select(*out)


def batch_novelty(
    batch_state: DataFrame, history_state: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Estimated distinct items in the batch NOT present in history:
    theta set difference per group (the sketch operation HLL cannot
    do). Groups absent from history are fully novel — the left join's
    null side falls back to the batch's own estimate."""
    b = batch_state.select(
        *group_cols,
        F.col("n_rows").alias("batch_rows"),
        F.col("theta").alias("_bt"),
    )
    h = history_state.select(*group_cols, F.col("theta").alias("_ht"))
    j = b.join(h, on=group_cols, how="left")
    novel = F.when(
        F.col("_ht").isNull(), F.theta_sketch_estimate("_bt")
    ).otherwise(F.theta_sketch_estimate(F.theta_difference("_bt", "_ht")))
    return j.select(
        *group_cols,
        "batch_rows",
        F.round(F.theta_sketch_estimate("_bt")).cast("long").alias("batch_distinct"),
        F.round(novel).cast("long").alias("novel_distinct"),
    )
