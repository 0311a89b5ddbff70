"""Streaming exactly-once sink into the Iceberg-shaped table
(streaming/table_sink.py): one snapshot per micro-batch, replayed
batches never duplicate rows (marker-in-summary + watermark sidecar,
both failure windows covered), restart with the same checkpoint is a
no-op, and the committed batches flow straight back out through
read_incremental — the stream-in -> table -> stream-out loop."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.streaming.table_sink import (
    _watermark_path,
    committed_batch_id,
    make_table_appender,
)


def _rows(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        F.col("id").cast("double").alias("x"),
    )


def _stream_files(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for i, (lo, n) in enumerate(batches):
        _rows(spark, lo, n).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    schema = _rows(spark, 0, 1).schema
    return spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)


def test_stream_commits_one_snapshot_per_batch(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    sdf = _stream_files(spark, tmp_path, [(0, 10), (10, 10), (20, 10)])
    q = (
        sdf.writeStream.foreachBatch(make_table_appender(tbl))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert tbl.read(spark).count() == 30
    ops = [h["operation"] for h in tbl.history()]
    assert ops.count("append") == 3
    assert committed_batch_id(tbl, "ingest") == 2


def test_replayed_batch_is_skipped_both_layers(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    body = make_table_appender(tbl, name="ing")
    body(_rows(spark, 0, 10), 0)
    body(_rows(spark, 10, 10), 1)
    head = tbl.current_snapshot_id()

    # layer 2 (watermark): plain replay of an old batch is a no-op
    body(_rows(spark, 10, 10), 1)
    body(_rows(spark, 0, 10), 0)
    assert tbl.current_snapshot_id() == head
    assert tbl.read(spark).count() == 20

    # layer 1 (marker in summary): simulate a crash AFTER the commit
    # but BEFORE the watermark write — the lineage walk must still
    # prove batch 1 committed
    os.remove(_watermark_path(tbl, "ing"))
    assert committed_batch_id(tbl, "ing") == 1
    body(_rows(spark, 10, 10), 1)
    assert tbl.current_snapshot_id() == head
    assert tbl.read(spark).count() == 20


def test_restart_same_checkpoint_no_duplicates(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    sdf = _stream_files(spark, tmp_path, [(0, 10), (10, 10)])
    ck = str(tmp_path / "ck")
    for _ in range(2):  # second run replays nothing new
        q = (
            sdf.writeStream.foreachBatch(make_table_appender(tbl))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    assert tbl.read(spark).count() == 20
    assert [h["operation"] for h in tbl.history()].count("append") == 2


def test_sink_feeds_incremental_reader(spark, tmp_path):
    """Each streamed batch surfaces downstream as exactly its own
    rows via read_incremental — the loop the architecture promises."""
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    body = make_table_appender(tbl)
    body(_rows(spark, 0, 15), 0)
    mid = tbl.current_snapshot_id()
    body(_rows(spark, 15, 5), 1)
    inc = tbl.read_incremental(spark, from_snapshot_id=mid)
    got = sorted(r.clip_id for r in inc.collect())
    assert got == sorted(f"clip-{i}" for i in range(15, 20))


def test_distinct_sinks_do_not_interfere(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    a = make_table_appender(tbl, name="a")
    b = make_table_appender(tbl, name="b")
    a(_rows(spark, 0, 5), 0)
    b(_rows(spark, 100, 5), 0)  # same batch id, different sink: committed
    assert tbl.read(spark).count() == 10
    assert committed_batch_id(tbl, "a") == 0
    assert committed_batch_id(tbl, "b") == 0


def test_empty_batch_advances_watermark_without_snapshot(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    body = make_table_appender(tbl)
    body(_rows(spark, 0, 5), 0)
    head = tbl.current_snapshot_id()
    body(_rows(spark, 0, 5).where("x < 0"), 1)  # empty
    assert tbl.current_snapshot_id() == head
    assert committed_batch_id(tbl, "ingest") == 1
