"""Mergeable sketch state (operators/sketches.py): accuracy vs exact
answers, merge-of-batches ≈ single pass, parquet round-trip, and
theta-difference batch novelty with planted overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.sketches import (
    batch_novelty,
    estimate_state,
    merge_states,
    sketch_batch,
)

REL = 0.05  # test gate; sketch configs bound RSE well under this


def _corpus(spark, n=20000, mod=6000):
    return spark.range(n).select(
        (F.col("id") % 3).cast("int").alias("g"),
        F.concat(F.lit("tok-"), F.col("id") % mod).alias("tok"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


def test_sketch_estimates_match_exact(spark):
    df = _corpus(spark)
    est = estimate_state(
        sketch_batch(df, ["g"], "tok", "v"), quantiles=(0.5, 0.9)
    ).toPandas().set_index("g")
    exact = (
        df.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("tok").alias("d"),
            F.expr("percentile(v, 0.5)").alias("m50"),
            F.expr("percentile(v, 0.9)").alias("m90"),
        )
        .toPandas()
        .set_index("g")
    )
    for g in exact.index:
        assert est.loc[g, "n_rows"] == exact.loc[g, "n"]
        for col in ("hll_distinct", "theta_distinct"):
            assert abs(est.loc[g, col] - exact.loc[g, "d"]) <= REL * exact.loc[g, "d"]
        # KLL rank error translates to value error via the (uniform) gap
        assert abs(est.loc[g, "q50"] - exact.loc[g, "m50"]) <= 0.05 * 1000
        assert abs(est.loc[g, "q90"] - exact.loc[g, "m90"]) <= 0.05 * 1000


def test_merged_batches_match_single_pass(spark):
    df = _corpus(spark)
    whole = estimate_state(sketch_batch(df, ["g"], "tok", "v")).toPandas().set_index("g")
    parts = [
        sketch_batch(df.where(f"id % 4 = {i}"), ["g"], "tok", "v") for i in range(4)
    ]
    merged = estimate_state(merge_states(parts, ["g"])).toPandas().set_index("g")
    for g in whole.index:
        assert merged.loc[g, "n_rows"] == whole.loc[g, "n_rows"]
        for col in ("hll_distinct", "theta_distinct"):
            assert (
                abs(merged.loc[g, col] - whole.loc[g, col])
                <= REL * whole.loc[g, col]
            )


def test_state_round_trips_through_parquet(spark, tmp_path):
    df = _corpus(spark, n=5000)
    state = sketch_batch(df, ["g"], "tok", "v")
    p = str(tmp_path / "state")
    state.write.parquet(p)
    a = estimate_state(state).toPandas().set_index("g").sort_index()
    b = estimate_state(spark.read.parquet(p)).toPandas().set_index("g").sort_index()
    # HLL/theta aggregation is deterministic; KLL compaction is
    # randomized per evaluation (so only bounded-equal vs the lazily
    # recomputed original)...
    assert a[["n_rows", "hll_distinct", "theta_distinct"]].equals(
        b[["n_rows", "hll_distinct", "theta_distinct"]]
    )
    assert (a["q50"] - b["q50"]).abs().max() <= 0.05 * 1000
    # ...but the PERSISTED state is stable: two reads agree exactly.
    again = estimate_state(spark.read.parquet(p)).toPandas().set_index("g").sort_index()
    assert b.equals(again)


def test_batch_novelty_planted_overlap(spark):
    # history: tok-0 .. tok-3999; batch: tok-2000 .. tok-5999 (2000 novel)
    hist = spark.range(0, 4000).select(
        F.lit(0).alias("g"), F.concat(F.lit("tok-"), F.col("id")).alias("tok")
    )
    batch = spark.range(2000, 6000).select(
        F.lit(0).alias("g"), F.concat(F.lit("tok-"), F.col("id")).alias("tok")
    )
    hs = sketch_batch(hist, ["g"], "tok")
    bs = sketch_batch(batch, ["g"], "tok")
    row = batch_novelty(bs, hs, ["g"]).collect()[0]
    assert abs(row["batch_distinct"] - 4000) <= REL * 4000
    assert abs(row["novel_distinct"] - 2000) <= REL * 2000


def test_batch_novelty_subset_and_new_group(spark):
    hist = spark.range(0, 4000).select(
        F.lit(0).alias("g"), F.concat(F.lit("tok-"), F.col("id")).alias("tok")
    )
    subset = spark.range(0, 1000).select(
        F.lit(0).alias("g"), F.concat(F.lit("tok-"), F.col("id")).alias("tok")
    )
    fresh = spark.range(0, 1000).select(
        F.lit(7).alias("g"), F.concat(F.lit("new-"), F.col("id")).alias("tok")
    )
    hs = sketch_batch(hist, ["g"], "tok")
    bs = sketch_batch(subset.unionByName(fresh), ["g"], "tok")
    rows = {r["g"]: r for r in batch_novelty(bs, hs, ["g"]).collect()}
    # a batch that is a pure subset of history adds ~nothing
    assert rows[0]["novel_distinct"] <= 0.02 * 4000
    # a group absent from history is fully novel
    assert abs(rows[7]["novel_distinct"] - 1000) <= REL * 1000


def test_merge_states_requires_input():
    with pytest.raises(ValueError, match="at least one state"):
        merge_states([], ["g"])
