"""Shuffle-key skew profiler (operators/skew.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from bdqc_spark.operators.skew import key_skew_profile


@pytest.fixture(scope="module")
def df(spark):
    # 1 key with 60 rows, 2 with 15, 27 uniform singletons: 30 keys,
    # 117 rows, mean 3.9, max 60 → skew_ratio 15.384615
    rows = (
        [("hot",)] * 60
        + [("warm1",)] * 15
        + [("warm2",)] * 15
        + [(f"cold{i:02d}",) for i in range(27)]
    )
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k"])).repartition(8)


def test_profile_values(spark, df):
    out = key_skew_profile(df, "k", top_k=5).toPandas().sort_values("rank")
    assert list(out["key"]) == ["hot", "warm1", "warm2", "cold00", "cold01"]
    assert list(out.cnt) == [60, 15, 15, 1, 1]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    assert out.share.iloc[0] == pytest.approx(60 / 117, abs=1e-6)
    assert out.skew_ratio.nunique() == 1
    assert out.skew_ratio.iloc[0] == pytest.approx(60 * 30 / 117, abs=1e-6)
    assert (out.rec_salt == 16).all()  # ceil(15.38)


def test_uniform_key_reports_no_skew(spark):
    rows = [(f"k{i % 10}",) for i in range(100)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = key_skew_profile(df, "k", top_k=3).toPandas()
    assert (out.skew_ratio.to_numpy() == 1.0).all()
    assert (out.rec_salt.to_numpy() == 1).all()


def test_salt_capped(spark):
    rows = [("mega",)] * 1000 + [(f"c{i}",) for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = key_skew_profile(df, "k", top_k=1).toPandas()
    assert out.rec_salt.iloc[0] == 32  # ratio ~167, capped


def test_tie_break_deterministic(spark):
    rows = [(c,) for c in "zzyyxxww"]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    out = key_skew_profile(df, "k", top_k=2).toPandas().sort_values("rank")
    assert list(out["key"]) == ["w", "x"]  # all cnt=2 → key asc


def test_plan_uses_distributed_topk(spark, df):
    plan = key_skew_profile(df, "k", top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
