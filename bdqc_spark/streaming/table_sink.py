"""Streaming ingest INTO the Iceberg-shaped table, exactly-once.

The mirror of streaming/incremental_source.py (which streams OUT of
the table): a foreachBatch body that commits each micro-batch as ONE
table snapshot. Structured Streaming guarantees at-least-once
execution of foreachBatch bodies, so exactly-once must come from the
sink — the same problem real Iceberg's Spark streaming writer solves
by recording the epoch id in the snapshot summary and skipping
already-committed epochs on replay.

Dedup protocol (two layers, both needed):

1. The batch id is recorded in the snapshot SUMMARY, atomically with
   the data commit (``append(summary_extra=...)``): a retry that
   crashed after commit but before any bookkeeping is still detected
   by walking the lineage for the marker — the freshly committed
   manifest is by definition not yet expired.
2. A sidecar high-watermark (``metadata/stream-sink-<name>.json``)
   is updated after each commit: it survives snapshot EXPIRY (the
   lineage walk cannot see expired manifests), and makes the common
   no-replay case O(1) instead of a lineage walk.

A batch is skipped iff its id is <= the sidecar watermark OR its
marker is found in the lineage walk (batch ids are monotone per
checkpoint — Structured Streaming's contract). Different sinks on
one table use distinct ``name``s and do not interfere.

At 10^12 clips the per-batch cost stays metadata-bounded: one
manifest write per micro-batch plus the parquet append itself;
downstream consumers (read_incremental / IcebergishStreamReader) see
each batch as exactly one new snapshot, closing the loop
stream-in -> table -> stream-out with end-to-end exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from bdqc_spark.sources.iceberg import IcebergishTable

MARKER = "stream_sink"


def _watermark_path(tbl: IcebergishTable, name: str) -> str:
    return os.path.join(tbl.meta_dir, f"stream-sink-{name}.json")


def _read_watermark(tbl: IcebergishTable, name: str) -> int | None:
    try:
        with open(_watermark_path(tbl, name)) as f:
            return int(json.load(f)["max_batch_id"])
    except FileNotFoundError:
        return None


def _write_watermark(tbl: IcebergishTable, name: str, batch_id: int) -> None:
    os.makedirs(tbl.meta_dir, exist_ok=True)
    path = _watermark_path(tbl, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"max_batch_id": int(batch_id)}, f)
    os.rename(tmp, path)


def committed_batch_id(tbl: IcebergishTable, name: str) -> int | None:
    """Highest batch id proven committed for this sink: the sidecar
    watermark, upgraded by a lineage walk to the NEWEST snapshot
    carrying this sink's marker (covers the crash-between-commit-and-
    watermark window; the walk stops at the first marker found —
    batch ids are monotone, so the newest marker is the max)."""
    wm = _read_watermark(tbl, name)
    sid = tbl.current_snapshot_id()
    while sid is not None:
        s = tbl._snapshot_if_present(sid)
        if s is None:  # expired history: the sidecar is the authority
            break
        mk = s["summary"].get(MARKER)
        if mk and mk.get("name") == name:
            lineage_id = int(mk["batch_id"])
            return lineage_id if wm is None else max(wm, lineage_id)
        sid = s["parent_snapshot_id"]
    return wm


def make_table_appender(tbl: IcebergishTable, name: str = "ingest"):
    """The foreachBatch body: append the micro-batch as one snapshot
    with the (name, batch_id) marker in its summary; skip batches
    already proven committed. Empty batches commit nothing (and thus
    create no empty snapshots)."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        batch_id = int(batch_id)
        done = committed_batch_id(tbl, name)
        if done is not None and batch_id <= done:
            return
        if batch_df.isEmpty():
            _write_watermark(tbl, name, batch_id)
            return
        tbl.append(
            batch_df,
            summary_extra={MARKER: {"name": name, "batch_id": batch_id}},
        )
        _write_watermark(tbl, name, batch_id)

    return _append
