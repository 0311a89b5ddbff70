"""rollback_to: Iceberg's rollback_to_snapshot as a pure pointer move.

Invariants a 10^12-clip deployment relies on when an ingest batch
turns out bad AFTER publish (the recovery path write-audit-publish
cannot cover): the rollback is O(1) metadata, time travel to the
abandoned snapshots keeps working until expiry, incremental
consumers positioned past the rollback point never see rolled-back
rows re-delivered, and expiry + orphan removal reclaim the abandoned
lineage unless a ref pins it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable


def _append(tbl, spark, lo, hi):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        (F.col("id") % 7).cast("double").alias("x"),
    )
    return tbl.append(df)


def _ids(spark, tbl, **kw):
    return sorted(r.clip_id for r in tbl.read(spark, **kw).select("clip_id").collect())


def test_rollback_pointer_move_and_time_travel(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    snap_a = _append(tbl, spark, 0, 50)
    ids_a = _ids(spark, tbl)
    snap_b = _append(tbl, spark, 50, 90)
    ids_ab = _ids(spark, tbl)
    assert len(ids_ab) == 90

    assert tbl.rollback_to(snap_a) == snap_a
    assert tbl.current_snapshot_id() == snap_a
    assert _ids(spark, tbl) == ids_a
    # no new snapshot was created: the manifest set is unchanged
    snaps = [e for e in os.listdir(tbl.meta_dir) if e.startswith("snap-")]
    assert len(snaps) == 2
    # time travel to the abandoned head still works until expiry
    assert _ids(spark, tbl, snapshot_id=snap_b) == ids_ab


def test_rollback_rejects_non_ancestor_and_unknown(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    snap_a = _append(tbl, spark, 0, 30)
    snap_b = _append(tbl, spark, 30, 60)
    tbl.rollback_to(snap_a)
    # snap_b is now on an abandoned lineage: not an ancestor of current
    with pytest.raises(ValueError, match="not an ancestor"):
        tbl.rollback_to(snap_b)
    with pytest.raises(ValueError, match="no snapshot"):
        tbl.rollback_to("deadbeef00000000")
    # no-op rollback to the current snapshot is allowed
    assert tbl.rollback_to(snap_a) == snap_a


def test_rollback_incremental_consumer_never_sees_rolled_back_rows(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    snap_a = _append(tbl, spark, 0, 40)
    snap_b = _append(tbl, spark, 40, 70)
    # consumer processed through snap_b, then the table rolls back
    tbl.rollback_to(snap_a)
    assert tbl.appended_files(snap_b) == []
    assert tbl.read_incremental(spark, snap_b).count() == 0
    # a fresh append after the rollback delivers exactly its own rows
    _append(tbl, spark, 100, 120)
    inc = tbl.read_incremental(spark, snap_b)
    got = sorted(r.clip_id for r in inc.select("clip_id").collect())
    assert got == sorted(f"clip-{i}" for i in range(100, 120))
    # and a consumer at the rollback target sees only the new batch
    inc_a = tbl.read_incremental(spark, snap_a)
    assert sorted(r.clip_id for r in inc_a.select("clip_id").collect()) == got


def test_rollback_then_expire_reclaims_abandoned_lineage(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    snap_a = _append(tbl, spark, 0, 40)
    snap_b = _append(tbl, spark, 40, 70)
    abandoned_files = set(tbl.appended_files(snap_a, snap_b))
    assert abandoned_files
    tbl.rollback_to(snap_a)
    # generous retention does NOT save an unreachable snapshot
    expired = tbl.expire_snapshots(keep_last=5)
    assert expired == [snap_b]
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(snap_b)
    removed = set(tbl.remove_orphans(older_than_s=0))
    assert removed == abandoned_files
    assert _ids(spark, tbl) == sorted(f"clip-{i}" for i in range(40))


def test_rollback_tagged_head_survives_expiry(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    snap_a = _append(tbl, spark, 0, 40)
    snap_b = _append(tbl, spark, 40, 70)
    tbl.create_tag("pre-rollback", snap_b)
    ids_ab = _ids(spark, tbl)
    tbl.rollback_to(snap_a)
    assert tbl.expire_snapshots(keep_last=1) == []  # tag is a GC root
    assert _ids(spark, tbl, snapshot_id=tbl.ref_snapshot_id("pre-rollback")) == ids_ab


def test_rollback_on_branch_moves_only_the_branch(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    _append(tbl, spark, 0, 30)
    main_head = tbl.current_snapshot_id()
    tbl.create_branch("stage")
    stage = tbl.branch("stage")
    stage_a = stage.current_snapshot_id()
    _append(stage, spark, 30, 50)
    assert stage.current_snapshot_id() != stage_a
    stage.rollback_to(stage_a)
    assert stage.current_snapshot_id() == stage_a
    assert tbl.current_snapshot_id() == main_head
    assert len(_ids(spark, stage)) == 30
