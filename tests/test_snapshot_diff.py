"""Manifest-only snapshot diff (sources/iceberg.py::snapshot_diff)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapdiff") / "t")
    t = IcebergishTable(root, num_buckets=4)
    s1 = t.append(generate_clips_df(spark, 200, seed=1))
    s2 = t.append(generate_clips_df(spark, 100, seed=2))
    return t, s1, s2


def test_append_diff(spark, table):
    t, s1, s2 = table
    d = t.snapshot_diff(s1, s2)
    assert d["row_delta"] == 100
    assert d["files_added"] > 0 and d["files_removed"] == 0
    assert d["rows_in_added_files"] == 100
    assert d["operations"] == ["append"]
    assert d["spec_change"] is None and d["schema_change"] is None
    assert sum(b["files_added"] for b in d["per_bucket"].values()) == d["files_added"]


def test_compact_diff_row_preserving(spark, table):
    t, s1, s2 = table
    s3 = t.compact(spark)
    d = t.snapshot_diff(s2, s3)
    assert d["row_delta"] == 0
    assert d["files_removed"] > 0 and d["files_added"] > 0
    assert d["rows_in_added_files"] == 300
    assert d["rows_in_removed_files"] == 300  # originals still on disk
    assert d["operations"] == ["rewrite"]
    # multi-step chain from s1, newest first
    full = t.snapshot_diff(s1)
    assert full["operations"] == ["rewrite", "append"]
    assert full["row_delta"] == 100


def test_delete_diff(spark, table):
    t, s1, s2 = table
    before = t.snapshot()["summary"]["total_rows"]
    assert before == 300
    ids = [r[0] for r in t.read(spark).select("clip_id").limit(5).collect()]
    matched = t.read(spark).where(F.col("clip_id").isin(ids)).count()
    sid = t.delete(spark, F.col("clip_id").isin(ids))
    assert sid is not None and matched >= 5
    after = t.snapshot()["summary"]["total_rows"]
    assert after == 300 - matched
    d = t.snapshot_diff(s2)
    assert d["row_delta"] == after - 300
    assert "delete" in d["operations"]


def test_unrelated_and_missing_snapshots(spark, table):
    t, s1, s2 = table
    with pytest.raises(ValueError, match="must exist"):
        t.snapshot_diff("does-not-exist")
    # reversed direction: old is not an ancestor of new → operations None
    d = t.snapshot_diff(t.current_snapshot_id(), s1)
    assert d["operations"] is None
    assert d["row_delta"] < 0  # going backwards loses the later appends
