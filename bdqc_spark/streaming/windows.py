"""Structured Streaming operators (SURVEY.md §2.B T1-T4).

The reference is batch-incremental, not streaming (SURVEY.md §2.A) —
these exist because a real analytics engine needs them and because
ops-style monitoring of a 10^12-clip ingest (events per window,
late-data tolerance, exactly-once dedup) is how such a pipeline is
run in production. Each wrapper works on BOTH a static and a
streaming DataFrame (identical code path — idiomatic Spark), which
is also how the batch-equivalence tests verify semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1: tumbling-window counts with late-data watermark."""
    if df.isStreaming:
        # parquet event times arrive as TIMESTAMP_NTZ; watermarks need
        # TIMESTAMP (session tz is pinned to UTC, so this is lossless)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *(keys or []))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(keys or []),
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1: sliding-window counts."""
    if df.isStreaming:
        # parquet event times arrive as TIMESTAMP_NTZ; watermarks need
        # TIMESTAMP (session tz is pinned to UTC, so this is lossless)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), *(keys or []))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *(keys or []), "n")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T4: session windows (gap-based) per key."""
    if df.isStreaming:
        # parquet event times arrive as TIMESTAMP_NTZ; watermarks need
        # TIMESTAMP (session tz is pinned to UTC, so this is lossless)
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("s"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def running_cohort_stats(
    df: DataFrame,
    key: str = "codec",
    value_col: str = "dur_ms",
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-cohort RUNNING count/mean/variance across micro-batches — the
    live-ingest twin of the batch cohort-model fit (an ops monitor
    can watch a cohort's distribution drift without refitting).

    State per key is three scalars (n, mean, M2). Each micro-batch is
    reduced with numpy first and merged into state with the parallel
    Welford/Chan merge formula — the Python loop is per-KEY per
    batch, never per row. Emits the updated running stats for every
    key seen in the batch (update mode).

    Works on a static DataFrame too (plain aggregate — identical
    observable semantics), which is how the batch-equivalence test
    verifies it.
    """
    if not df.isStreaming:
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(key)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.avg(F.col(value_col).cast("double")).alias("mean"),
                (
                    F.var_pop(F.col(value_col).cast("double")) * F.count(F.lit(1))
                ).alias("m2"),
            )
        )

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key_tuple, pdfs, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            v = pd.to_numeric(pdf[value_col], errors="coerce").dropna().to_numpy(
                dtype=np.float64
            )
            bn = int(v.size)
            if bn == 0:
                continue
            bmean = float(v.mean())
            bm2 = float(((v - bmean) ** 2).sum())
            # Chan et al. parallel merge of (n, mean, M2) pairs
            delta = bmean - mean
            tot = n + bn
            mean = mean + delta * bn / tot
            m2 = m2 + bm2 + delta * delta * n * bn / tot
            n = tot
        state.update((n, float(mean), float(m2)))
        yield pd.DataFrame(
            [{key: key_tuple[0], "n": n, "mean": float(mean), "m2": float(m2)}]
        )

    return df.groupBy(key).applyInPandasWithState(
        _update,
        outputStructType=f"{key} string, n long, mean double, m2 double",
        stateStructType="n long, mean double, m2 double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3: exactly-once keyed dedup with bounded state.

    Streaming: dropDuplicatesWithinWatermark keeps per-key state only
    until the watermark passes — state is bounded, which is what makes
    exactly-once clip ingestion feasible at 10^12 scale.
    Static: plain dropDuplicates (same observable semantics when all
    duplicates fall inside one watermark span).
    """
    if df.isStreaming:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_sec: int,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5: stream-stream inner join within an event-time interval —
    the canonical two-feed correlation (here: a clip-arrival feed
    joined to its transcript-arrival feed; classically clicks to
    impressions). Matches rows sharing ``key`` whose timestamps are
    within ``tolerance_sec`` of each other.

    Streaming: BOTH sides carry a watermark and the join condition
    bounds right's event time relative to left's, so Spark can expire
    buffered state — without the time bound a stream-stream join
    would buffer both streams forever (state grows with the corpus;
    at 10^12 rows that is the job's death). With the bound, state per
    side is O(rows inside watermark + tolerance) regardless of total
    stream length.

    Static: the identical join condition degenerates to a plain
    interval equi-join — same code path, which is how the
    batch-equivalence test verifies semantics.

    → columns: key, ``{ts_col}_l``, ``{ts_col}_r`` plus each side's
    payload columns (callers project/rename payloads to avoid
    collisions before calling).
    """
    l = left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    r = right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if l.isStreaming:
        l = l.withWatermark(ts_col, watermark)
    if r.isStreaming:
        r = r.withWatermark(ts_col, watermark)
    l = l.withColumnRenamed(ts_col, f"{ts_col}_l")
    r = r.withColumnRenamed(ts_col, f"{ts_col}_r").withColumnRenamed(key, f"_{key}_r")
    cond = (
        (l[key] == r[f"_{key}_r"])
        & (r[f"{ts_col}_r"] >= l[f"{ts_col}_l"] - F.expr(f"INTERVAL {tolerance_sec} SECONDS"))
        & (r[f"{ts_col}_r"] <= l[f"{ts_col}_l"] + F.expr(f"INTERVAL {tolerance_sec} SECONDS"))
    )
    return l.join(r, cond, "inner").drop(f"_{key}_r")
