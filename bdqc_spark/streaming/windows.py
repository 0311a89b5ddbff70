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
