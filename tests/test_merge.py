"""Copy-on-write MERGE / upsert (sources/iceberg.py::merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    t.append(generate_clips_df(spark, 120, seed=31))
    return t


def _batch(spark, t, n_updates=5, n_inserts=7):
    """A batch of existing keys (new transcripts) + brand-new keys."""
    existing = (
        t.read(spark)
        .orderBy("clip_id")
        .limit(n_updates)
        .drop("bucket")
        .withColumn("transcript", F.concat(F.lit("UPSERTED "), F.col("transcript")))
    )
    fresh = (
        generate_clips_df(spark, n_inserts, seed=99)
        .withColumn("clip_id", F.concat(F.lit("new-"), F.col("clip_id")))
    )
    return existing.unionByName(fresh), existing, fresh


def test_merge_updates_and_inserts(spark, table):
    t = table
    s0 = t.current_snapshot_id()
    batch, existing, fresh = _batch(spark, t)
    sid = t.merge(spark, batch)
    snap = t.snapshot()
    assert snap["operation"] == "merge"
    assert snap["summary"] == {
        "total_rows": 127, "updated_rows": 5, "inserted_rows": 7,
        "rewritten_files": snap["summary"]["rewritten_files"],
    }
    cur = t.read(spark)
    assert cur.count() == 127
    # updated keys carry the batch's row, exactly once each
    up = cur.where(F.col("transcript").startswith("UPSERTED"))
    assert up.count() == 5
    assert (
        cur.join(existing.select("clip_id"), "clip_id").count() == 5
    )  # no duplicate versions of an upserted key
    # inserted keys present
    assert cur.where(F.col("clip_id").startswith("new-")).count() == 7
    # time travel: pre-merge snapshot has the old rows
    old = t.read(spark, snapshot_id=s0)
    assert old.count() == 120
    assert old.where(F.col("transcript").startswith("UPSERTED")).count() == 0
    # snapshot_diff understands the operation
    d = t.snapshot_diff(s0)
    assert d["row_delta"] == 7 and d["operations"] == ["merge"]
    assert sid == snap["snapshot_id"]


def test_merge_changelog_emits_batch_rows_only(spark, table):
    t = table
    s0 = t.current_snapshot_id()
    batch, _, _ = _batch(spark, t, n_updates=3, n_inserts=4)
    t.merge(spark, batch)
    inc = t.read_incremental(spark, from_snapshot_id=s0)
    # upsert changelog: exactly the batch's 7 row versions
    assert inc.count() == 7
    assert inc.where(F.col("transcript").startswith("UPSERTED")).count() == 3
    assert inc.where(F.col("clip_id").startswith("new-")).count() == 4


def test_merge_guards(spark, table):
    t = table
    batch, _, _ = _batch(spark, t, n_updates=2, n_inserts=2)
    dup = batch.unionByName(batch.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(spark, dup)
    with pytest.raises(ValueError, match="drops known column"):
        t.merge(spark, batch.drop("transcript"))
    assert t.read(spark).count() == 120  # nothing committed


def test_merge_pure_insert_and_pure_update(spark, table):
    t = table
    _, existing, fresh = _batch(spark, t, n_updates=4, n_inserts=6)
    t.merge(spark, fresh)  # pure insert
    assert t.snapshot()["summary"]["updated_rows"] == 0
    assert t.read(spark).count() == 126
    t.merge(spark, existing)  # pure update
    s = t.snapshot()["summary"]
    assert s["updated_rows"] == 4 and s["inserted_rows"] == 0
    assert t.read(spark).count() == 126
