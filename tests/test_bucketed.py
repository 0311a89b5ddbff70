"""Bucketed tables + shuffle-free co-located joins (sources/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture()
def db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt_test LOCATION '{tmp_path}/wh'")
    yield "bkt_test"
    spark.sql("DROP DATABASE IF EXISTS bkt_test CASCADE")


def _facts(spark, n, seed_col):
    return spark.range(n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") * seed_col).cast("double").alias(f"v{seed_col}"),
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_matched_buckets_join_without_exchange(spark, db):
    write_bucketed(_facts(spark, 500, 3), f"{db}.a", "clip_id", 8)
    write_bucketed(_facts(spark, 400, 7), f"{db}.b", "clip_id", 8)
    j = colocated_join(spark, f"{db}.a", f"{db}.b", "clip_id")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert j.count() == 400  # inner join on the 400 shared keys


def test_results_match_plain_shuffle_join(spark, db):
    left, right = _facts(spark, 300, 3), _facts(spark, 350, 7)
    write_bucketed(left, f"{db}.a", "clip_id", 4)
    write_bucketed(right, f"{db}.b", "clip_id", 4)
    got = sorted(
        colocated_join(spark, f"{db}.a", f"{db}.b", "clip_id").collect()
    )
    want = sorted(left.join(right, "clip_id").collect())
    assert got == want


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, db):
    write_bucketed(_facts(spark, 200, 3), f"{db}.a", "clip_id", 8)
    write_bucketed(_facts(spark, 200, 7), f"{db}.b", "clip_id", 3)
    j = colocated_join(spark, f"{db}.a", f"{db}.b", "clip_id")
    assert "Exchange" in _plan(j)  # layout mismatch -> not co-located
    assert j.count() == 200  # still correct


def test_left_join_and_overwrite_idempotent(spark, db):
    write_bucketed(_facts(spark, 100, 3), f"{db}.a", "clip_id", 4)
    write_bucketed(_facts(spark, 60, 7), f"{db}.b", "clip_id", 4)
    # overwrite with fresh contents: re-run is idempotent
    write_bucketed(_facts(spark, 60, 7), f"{db}.b", "clip_id", 4)
    j = colocated_join(spark, f"{db}.a", f"{db}.b", "clip_id", how="left")
    assert "Exchange" not in _plan(j)
    assert j.count() == 100
    assert j.where(F.col("v7").isNull()).count() == 40


def test_bad_bucket_count_refused(spark, db):
    with pytest.raises(ValueError):
        write_bucketed(_facts(spark, 10, 3), f"{db}.a", "clip_id", 0)
