"""Shuffle-key skew profiler.

Every heavy operator in this engine shuffles on some key, and the
salted-join / LSH-cap / AQE machinery only helps once you KNOW a key
is skewed. This operator is the measurement: per-key counts (one
partial-agg shuffle — the same cost profile as the groupBy you are
about to run), the corpus-level skew ratio

    skew_ratio = max_count / mean_count  (= max_count · n_keys / total)

and the top-k heavy hitters, plus a recommended salt factor
(⌈skew_ratio⌉ capped at 32 — splitting the hottest key into about
mean-sized shards, the sizing rule operators/joins.salted_join
documents).

Scale shape: the heavy-hitter selection is ``orderBy(...).limit(k)``
— Spark's distributed TakeOrdered, never a global window over the
(possibly billions-row) per-key count table; the one-row summary
joins back by broadcast. Ties at the boundary are made deterministic
by the (count desc, key asc) order, so the result is reproducible
and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SALT = 32


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """→ (key, cnt, rank, share, skew_ratio, rec_salt) for the top_k
    heaviest keys; skew_ratio/rec_salt are corpus-level (identical on
    every row)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    summary = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    hh = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))  # ≤ top_k rows: tiny
    ratio = F.col("max_cnt") * F.col("n_keys") / F.col("total")
    return (
        hh.crossJoin(F.broadcast(summary))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "key",
            "cnt",
            "rank",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
            F.round(ratio, 6).alias("skew_ratio"),
            F.least(F.lit(MAX_SALT), F.ceil(ratio)).cast("int").alias("rec_salt"),
        )
    )
