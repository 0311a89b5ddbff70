"""As-of and interval joins (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.asof import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tables(spark):
    quotes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["a", "a", "a", "b", "b"],
                "ts": [_ts(0), _ts(10), _ts(10), _ts(5), _ts(50)],
                "qid": [1, 2, 3, 4, 5],
                "px": [100.0, 101.0, 101.5, 50.0, 51.0],
            }
        )
    )
    trades = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["a", "a", "a", "b", "b", "c"],
                "ts": [_ts(4), _ts(10), _ts(30), _ts(4), _ts(60), _ts(1)],
                "tid": [10, 11, 12, 13, 14, 15],
            }
        )
    )
    return trades, quotes


def test_backward_semantics(spark, tables):
    trades, quotes = tables
    out = (
        asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid")
        .orderBy("tid")
        .collect()
    )
    got = {r.tid: (r.qid_r, r.px_r) for r in out}
    assert got[10] == (1, 100.0)  # ts=4 → quote at 0
    # exact-ts match included; equal-ts tie → greatest qid wins
    assert got[11] == (3, 101.5)
    assert got[12] == (3, 101.5)  # ts=30 → still the 10s quote
    assert got[13] == (None, None)  # b@4: no quote yet
    assert got[14] == (5, 51.0)
    assert got[15] == (None, None)  # sym c: no quotes at all
    assert len(out) == 6  # left outer: every trade survives


def test_forward_semantics(spark, tables):
    trades, quotes = tables
    out = asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid", direction="forward")
    got = {r.tid: r.qid_r for r in out.collect()}
    # ts=4 → next quote at 10; equal-ts tie → greatest qid, matching
    # the backward convention
    assert got[10] == 3
    assert got[12] is None  # nothing after 30 for a
    assert got[13] == 4  # b@4 → quote at 5
    assert got[15] is None


def test_tolerance(spark, tables):
    trades, quotes = tables
    out = asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid", tolerance_s=5.0)
    got = {r.tid: r.qid_r for r in out.collect()}
    assert got[10] == 1  # gap 4s ≤ 5
    assert got[11] == 3  # gap 0
    assert got[12] is None  # gap 20s > 5 → nulled
    assert got[14] is None  # gap 10s > 5 → nulled


def test_matches_duckdb_asof(spark, tables):
    import duckdb

    trades, quotes = tables
    tp, qp = trades.toPandas(), quotes.toPandas()
    con = duckdb.connect()
    con.register("t", tp)
    con.register("q", qp)
    want = con.execute(
        """
        SELECT t.tid, r.qid AS qid_r FROM t LEFT JOIN LATERAL (
          SELECT qid FROM q WHERE q.sym = t.sym AND q.ts <= t.ts
          ORDER BY q.ts DESC, q.qid DESC LIMIT 1) r ON true
        ORDER BY t.tid
        """
    ).df()
    got = (
        asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid")
        .select("tid", "qid_r")
        .orderBy("tid")
        .toPandas()
    )
    assert got.qid_r.astype("Float64").equals(want.qid_r.astype("Float64")), (got, want)


def test_guards(spark, tables):
    trades, quotes = tables
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid", direction="nearest")
    with pytest.raises(ValueError, match="one window partition"):
        asof_join(trades, quotes, "ts", by=[], seq_col="qid")


def test_single_shuffle_plan(spark, tables):
    trades, quotes = tables
    plan = (
        asof_join(trades, quotes, "ts", by=["sym"], seq_col="qid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides feed one window


# ---------------------------------------------------------------- intervals
@pytest.fixture(scope="module")
def intervals(spark):
    li = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "x", "y"],
                "lid": [1, 2, 3, 4],
                "s": [0.0, 10.0, 100.0, 0.0],
                "e": [5.0, 20.0, 110.0, 5.0],
            }
        )
    )
    ri = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "x", "y", "y"],
                "rid": [1, 2, 3, 4, 5],
                "s": [4.0, 30.0, 104.5, 5.0, 6.0],
                "e": [12.0, 40.0, 105.0, 9.0, 9.0],
            }
        )
    )
    return li, ri


def test_interval_join_exact(spark, intervals):
    li, ri = intervals
    out = interval_join(
        li, ri, by=["k"], l_id="lid", r_id="rid",
        l_start="s", l_end="e", r_start="s", r_end="e", bin_width=7.0,
    )
    got = sorted((r.k, r.lid, r.rid, r.overlap_start, r.overlap_end) for r in out.collect())
    # brute force: closed-interval overlap per key
    lp, rp = li.toPandas(), ri.toPandas()
    want = sorted(
        (l.k, l.lid, r.rid, max(l.s, r.s), min(l.e, r.e))
        for _, l in lp.iterrows()
        for _, r in rp.iterrows()
        if l.k == r.k and l.s <= r.e and r.s <= l.e
    )
    assert got == want
    assert ("x", 1, 1, 4.0, 5.0) in got  # boundary-touch at 4..5
    assert ("y", 4, 4, 5.0, 5.0) in got  # single-point closed overlap


def test_interval_join_bin_width_invariance(spark, intervals):
    li, ri = intervals
    a = interval_join(li, ri, ["k"], "lid", "rid", "s", "e", "s", "e", bin_width=1.0)
    b = interval_join(li, ri, ["k"], "lid", "rid", "s", "e", "s", "e", bin_width=50.0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError, match="positive"):
        interval_join(li, ri, ["k"], "lid", "rid", "s", "e", "s", "e", bin_width=0)


def test_interval_join_malformed_rows_match_nothing(spark):
    li = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "lid": [1], "s": [10.0], "e": [5.0]})  # end < start
    )
    ri = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "rid": [1], "s": [0.0], "e": [100.0]})
    )
    assert (
        interval_join(li, ri, ["k"], "lid", "rid", "s", "e", "s", "e", bin_width=5.0).count()
        == 0
    )
