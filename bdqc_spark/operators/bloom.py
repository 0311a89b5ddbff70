"""Broadcast Bloom-filter semi join — incremental dedup against history.

The recurring 100 TB problem: a new batch of documents/clips arrives
and must be deduplicated against the full historical corpus. Shuffling
the history per batch is a non-starter at 10^12 keys; what scales is a
*mergeable, broadcastable sketch* of the history:

1. ``build_bloom``   — ONE distributed pass over the history keys
   (explode k probe positions → groupBy(word) BIT_OR) produces an
   m-bit array as ``n_bits/64`` uint64 words.  The build is a pure
   map + one KB-output shuffle; the aggregation is associative, so
   partial blooms from incremental appends OR together — maintain the
   sketch as table metadata (like the manifest column stats in
   sources/iceberg.py) instead of rebuilding per batch.
2. ``might_contain`` — the probe positions are computed JVM-side
   (``xxhash64(key, seed_i) mod m`` — Catalyst, whole-stage codegen);
   only the bit lookups cross into Python, as ONE Arrow-vectorized
   pandas UDF over a broadcast numpy word array.  No per-row Python.
3. ``bloom_semi_join`` — prefilter the new batch map-side with the
   bloom, then exact-confirm only the survivors with a real semi
   join.  The bloom has NO false negatives by construction and the
   confirm join removes false positives, so the result is exactly
   ``new SEMI JOIN history`` regardless of sizing: m and k trade
   broadcast bytes against confirm-join traffic, never correctness.

Sizing intuition at scale: 10 bits/key ≈ 0.8 % FP at k=7, so the
confirm join's left side is (true dup rate + 0.8 %) of the batch —
the expensive exact join runs over a sliver of the input.  For
histories too large for one broadcast bloom, shard the sketch by key
prefix and probe the matching shard (same plan shape, per-shard
literals).

Reference semantics: bdqc dedups per-file scans sequentially
(SURVEY.md §3.1); this operator is the training-data-pipeline
extension required by the builder brief (incremental corpus dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 7


def _positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """array<bigint> of the k probe positions for ``key`` — each probe
    an independent xxhash64 draw under a distinct literal seed (no
    Kirsch-Mitzenmacher recombination needed), reduced mod m with
    pmod so positions are always in [0, m)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )


def build_bloom(
    df: DataFrame,
    key,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> np.ndarray:
    """Distributed Bloom build over ``df[key]`` → uint64 word array of
    length ``n_bits // 64``.

    Plan shape: Project(positions) → Explode → partial BIT_OR →
    Exchange on word index (at most m/64 distinct keys — KBs) → final
    BIT_OR → collect of ≤ m/64 rows.  Map-side combine does the heavy
    lifting; the collect is bounded by the sketch size, not the data.
    """
    if n_bits % 64 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 64")
    key = F.col(key) if isinstance(key, str) else key
    words = (
        df.select(F.explode(_positions(key, n_bits, n_hashes)).alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()  # bounded: ≤ n_bits/64 rows (the sketch), never the data
    )
    arr = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words:
        arr[int(r["w"])] = np.uint64(int(r["bits"]) & 0xFFFFFFFFFFFFFFFF)
    return arr


def might_contain(
    key: Column,
    words: np.ndarray,
    n_hashes: int = DEFAULT_N_HASHES,
    spark: SparkSession | None = None,
) -> Column:
    """Boolean Column: bloom membership test for ``key``.

    The k probe positions stay JVM-side (Catalyst xxhash64 + pmod);
    the UDF only indexes the broadcast word array — one vectorized
    numpy gather per Arrow batch."""
    if words.dtype != np.uint64:
        raise ValueError("words must be a uint64 array from build_bloom")
    n_bits = int(words.size) * 64
    spark = spark or SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(words)

    @pandas_udf("boolean")
    def _chk(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        w = bc.value
        P = np.vstack(pos.to_numpy())  # (n, k) int64, positions ∈ [0, m)
        bits = (w[P >> 6] >> (P & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return _chk(_positions(key, n_bits, n_hashes))


def bloom_semi_join(
    new_df: DataFrame,
    history_df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key_col`` exists in ``history_df`` —
    exactly ``new SEMI JOIN history``, computed as bloom-prefilter +
    exact confirm.  Only the prefilter survivors (true dups + the FP
    sliver) reach the shuffle; at production scale the history side is
    bucketed on the key so the confirm co-locates without a full
    history shuffle, and the bloom itself is maintained incrementally
    (BIT_OR-mergeable) rather than rebuilt."""
    words = build_bloom(history_df, key_col, n_bits, n_hashes)
    pre = new_df.filter(might_contain(F.col(key_col), words, n_hashes))
    return pre.join(
        history_df.select(key_col).distinct(), on=key_col, how="left_semi"
    )
