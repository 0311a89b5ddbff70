"""Manifest-diff streaming source over IcebergishTable (SURVEY.md
S2 × T3; VERDICT r3 ask #7): turns committed snapshots into a
Structured Streaming source, closing the batch-incremental ↔
streaming loop — the batch side appends snapshots, the stream side
scores exactly the new rows of each snapshot through the SAME
foreachBatch decide path (streaming/clips_stream.py).

Implemented as a Spark 4 Python Data Source (pyspark.sql.datasource)
with a DataSourceStreamReader whose OFFSETS ARE SNAPSHOT IDS:

- ``latestOffset`` re-reads ``metadata/version-hint.txt`` (the
  atomically swapped current pointer) each poll;
- ``partitions(start, end)`` diffs the two immutable manifests —
  the exact file set committed between the snapshots, one input
  partition per data file (never a directory listing, so orphan
  files from crashed appends are invisible, same guarantee as the
  batch reader's ``read_incremental``);
- ``read`` scans one parquet file with pyarrow in the Python worker
  and re-attaches the directory-derived ``bucket`` partition column.

Offset progression/replay is owned by the streaming checkpoint: a
restarted query re-plans the same (start, end] snapshot range and
gets the identical file diff (manifests are immutable), which is
what makes the downstream idempotent-sink contract hold end-to-end.

At 100 TB this source is the control plane only — each micro-batch's
data plane is ordinary partitioned parquet scans; a real Iceberg
catalog swaps in at the format level without touching the pipeline.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "icebergish_stream"


def _read_manifest(root: str, sid: str | None) -> dict | None:
    if sid is None:
        return None
    with open(os.path.join(root, "metadata", f"snap-{sid}.json")) as f:
        return json.load(f)


def _current_snapshot_id(root: str) -> str | None:
    try:
        with open(os.path.join(root, "metadata", "version-hint.txt")) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


class _FilePartition(InputPartition):
    def __init__(self, path: str, bucket: int, columns: list, drop_keys=(), key_col="clip_id"):
        self.path = path
        self.bucket = bucket
        self.columns = columns  # (name, ddl_type) in output order
        # keys tombstoned by a delete committed AFTER this file's
        # append, within the micro-batch's snapshot range — rows with
        # these keys must not be emitted (delete-aware changelog, r5)
        self.drop_keys = tuple(drop_keys)
        self.key_col = key_col


class IcebergishStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema_cols: list):
        self.root = root
        self.schema_cols = schema_cols  # [(name, type_ddl)] incl. bucket

    # -- offsets -----------------------------------------------------------
    def initialOffset(self) -> dict:
        # Stream starts BEFORE the first snapshot: the first micro-batch
        # covers the full table as of the first poll.
        return {"snapshot_id": None}

    def latestOffset(self) -> dict:
        return {"snapshot_id": _current_snapshot_id(self.root)}

    def partitions(self, start: dict, end: dict):
        new = _read_manifest(self.root, end.get("snapshot_id"))
        if new is None:
            return []
        # Row-exact changelog semantics (shared plan with
        # IcebergishTable.read_incremental): only files ADDED BY
        # APPEND snapshots — a compaction or rebucket committed
        # mid-stream must not re-emit rows the stream already
        # processed — and each file carries the key set tombstoned by
        # LATER in-range deletes, so a deleted row is never emitted
        # while a key re-appended after its delete still is (r5).
        from bdqc_spark.sources.iceberg import IcebergishTable

        tbl = IcebergishTable(self.root)
        plan = tbl.incremental_file_plan(start.get("snapshot_id"), end.get("snapshot_id"))
        parts = []
        data_dir = os.path.join(self.root, "data")
        for rel, drop_keys in plan:
            path = os.path.join(data_dir, rel)
            if not os.path.exists(path):
                continue  # appended then rewritten+orphan-swept in-range
            bucket = int(rel.split("/", 1)[0].split("=", 1)[1])
            parts.append(
                _FilePartition(
                    path, bucket, self.schema_cols, drop_keys, tbl.bucket_key
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        if partition.drop_keys:
            import pyarrow as pa
            import pyarrow.compute as pc

            mask = pc.invert(
                pc.is_in(
                    tbl.column(partition.key_col),
                    value_set=pa.array(list(partition.drop_keys)),
                )
            )
            tbl = tbl.filter(mask)
        cols = []
        for name, _ in partition.columns:
            if name == "bucket":
                cols.append([partition.bucket] * tbl.num_rows)
            else:
                cols.append(tbl.column(name).to_pylist())
        yield from zip(*cols)

    def commit(self, end: dict) -> None:
        # Offsets live in the streaming checkpoint; manifests are
        # immutable — nothing to clean up.
        pass


class IcebergishStreamDataSource(DataSource):
    """spark.readStream.format("icebergish_stream")
    .option("path", <table root>).load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("icebergish_stream requires .option('path', <table root>)")
        snap = _read_manifest(root, _current_snapshot_id(root))
        if snap is None:
            raise ValueError(f"no snapshot at {root}")
        cols = [e.split(":", 1) for e in snap["schema"]]
        if not any(n == "bucket" for n, _ in cols):
            cols.append(("bucket", "int"))
        return ", ".join(f"{n} {t}" for n, t in cols)

    def streamReader(self, schema) -> IcebergishStreamReader:
        root = self.options["path"]
        cols = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return IcebergishStreamReader(root, cols)


def register(spark) -> None:
    spark.dataSource.register(IcebergishStreamDataSource)


def clips_incremental_stream(
    spark,
    table_root: str,
    models,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """IcebergishTable snapshots → streaming decisions: register the
    manifest-diff source, read it as a stream, and feed the same
    idempotent decide/metrics/lineage sink as any other clip stream."""
    from bdqc_spark.streaming.clips_stream import stream_decide

    register(spark)
    clips = (
        spark.readStream.format(FORMAT_NAME).option("path", table_root).load()
    )
    return stream_decide(
        spark,
        clips,
        models,
        out_dir,
        checkpoint_dir,
        trigger_available_now=trigger_available_now,
    )
