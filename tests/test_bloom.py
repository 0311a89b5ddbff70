"""Bloom-filter semi join (operators/bloom.py).

Properties under test:
- NO false negatives (the correctness invariant the confirm join
  relies on): every inserted key probes true.
- FP rate lands near the textbook (1 - e^{-kn/m})^k — the sketch is
  a real bloom, not a lookup table.
- build_bloom's distributed BIT_OR path reproduces, bit for bit, a
  numpy twin fed the same Spark-computed probe positions.
- bloom_semi_join == plain left_semi join (FPs removed, nothing
  lost), and the prefilter actually shrinks what reaches the join.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.bloom import (
    _positions,
    bloom_semi_join,
    build_bloom,
    might_contain,
)

M = 1 << 14  # 16384 bits
K = 7
N_KEYS = 2000


@pytest.fixture(scope="module")
def members(spark):
    return spark.range(N_KEYS).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def words(members):
    return build_bloom(members, "k", n_bits=M, n_hashes=K)


def test_no_false_negatives(spark, members, words):
    n = members.filter(might_contain(F.col("k"), words, K)).count()
    assert n == N_KEYS


def test_fp_rate_near_theory(spark, words):
    probes = spark.range(N_KEYS, 2 * N_KEYS).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    fp = probes.filter(might_contain(F.col("k"), words, K)).count()
    theory = (1.0 - math.exp(-K * N_KEYS / M)) ** K  # ≈ 0.021 at this load
    assert 0 < fp < 3 * theory * N_KEYS, f"fp={fp}, theory≈{theory * N_KEYS:.1f}"


def test_build_matches_numpy_twin(spark, members, words):
    pos = members.select(
        F.explode(_positions(F.col("k"), M, K)).alias("p")
    ).collect()
    twin = np.zeros(M // 64, dtype=np.uint64)
    for r in pos:
        twin[r["p"] >> 6] |= np.uint64(1) << np.uint64(r["p"] & 63)
    assert np.array_equal(words, twin)


def test_bad_sizing_rejected(spark, members, words):
    with pytest.raises(ValueError):
        build_bloom(members, "k", n_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        might_contain(F.col("k"), words.astype(np.int64), K)


def test_semi_join_equals_exact(spark):
    hist = spark.range(1000).select(F.concat(F.lit("d-"), F.col("id")).alias("k"))
    new = spark.range(500, 1500).select(
        F.concat(F.lit("d-"), F.col("id")).alias("k"), F.col("id").alias("rowid")
    )
    got = bloom_semi_join(new, hist, "k", n_bits=1 << 16, n_hashes=K)
    want = new.join(hist, "k", "left_semi")
    assert sorted(r["rowid"] for r in got.collect()) == sorted(
        r["rowid"] for r in want.collect()
    )
    assert got.count() == 500  # the true overlap, FPs confirmed away


def test_prefilter_shrinks_join_input(spark):
    """The whole point at 100 TB: only (true dups + FP sliver) survive
    the map-side bloom filter — the exact join never sees the rest."""
    hist = spark.range(1000).select(F.concat(F.lit("d-"), F.col("id")).alias("k"))
    new = spark.range(500, 10500).select(
        F.concat(F.lit("d-"), F.col("id")).alias("k")
    )
    w = build_bloom(hist, "k", n_bits=1 << 16, n_hashes=K)
    survivors = new.filter(might_contain(F.col("k"), w, K)).count()
    # 500 true dups out of 10 000; FP theory at this load ≈ 2e-7
    assert 500 <= survivors < 600


def test_empty_history(spark):
    hist = spark.range(0).select(F.concat(F.lit("d-"), F.col("id")).alias("k"))
    new = spark.range(100).select(F.concat(F.lit("d-"), F.col("id")).alias("k"))
    out = bloom_semi_join(new, hist, "k", n_bits=1 << 10)
    assert out.count() == 0
