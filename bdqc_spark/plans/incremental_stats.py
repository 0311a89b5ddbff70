"""Incrementally maintained corpus statistics (materialized-view
maintenance over the Iceberg-ish table).

The 10^12-row reality: a stats dashboard (clips per codec, total
duration) cannot rescan the table per refresh. Iceberg's answer is
incremental view maintenance off the snapshot changelog, and this
plan implements the honest version of it:

- **Appends / compactions / rebuckets in range** → read ONLY the new
  rows (``read_incremental`` — rewrites are invisible by contract)
  and MERGE their aggregates into the persisted state. Cost is
  O(new rows), never O(table).
- **Deletes / updates / merges / rollbacks in range, or broken
  lineage (expired manifests)** → fall back to one full recompute.
  This is a real contract, not a cop-out: the table's changelog
  carries tombstoned KEYS, not pre-image rows (the same trade real
  Iceberg CDC makes without pre-image tracking), so the decrement an
  incremental delete-merge would need does not exist. The state
  records which mode produced it (``mode``), so the fallback is
  auditable.

Only distributive/algebraic aggregates live here (count, sum) —
exactly the ones that merge. Holistic stats (quantiles) belong to
the sketch path (operators/sketches.py), which is mergeable by
construction.

State is a KB-sized JSON persisted with the same write-then-rename
atomicity as the table's own manifests; a crashed refresh leaves the
previous state intact and the next refresh redoes the same delta
(idempotent: the merge keys on snapshot id, and a replayed refresh
from the same ``from`` recomputes the same numbers).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable

# operations whose in-range presence keeps the delta path valid:
# appends add rows; rewrite/rebucket move rows without changing them
# (read_incremental skips their files by contract)
_DELTA_SAFE_OPS = {"append", "rewrite", "rebucket"}


def _aggregate(df) -> dict:
    rows = (
        df.groupBy("codec")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("dur_ms").alias("dur_ms_sum"),
        )
        .collect()
    )
    return {
        r["codec"]: {"n_clips": r["n_clips"], "dur_ms_sum": int(r["dur_ms_sum"] or 0)}
        for r in rows
    }


def _merge(a: dict, b: dict) -> dict:
    out = {k: dict(v) for k, v in a.items()}
    for k, v in b.items():
        if k in out:
            out[k]["n_clips"] += v["n_clips"]
            out[k]["dur_ms_sum"] += v["dur_ms_sum"]
        else:
            out[k] = dict(v)
    return out


def load_stats(state_path: str) -> dict | None:
    try:
        with open(state_path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def refresh_stats(
    spark: SparkSession, table: IcebergishTable, state_path: str
) -> dict:
    """Bring the persisted per-codec stats up to the table's current
    snapshot. → the new state dict {snapshot_id, mode, stats}."""
    cur = table.current_snapshot_id()
    if cur is None:
        raise ValueError(f"no snapshot at {table.root}")
    prev = load_stats(state_path)
    if prev is not None and prev["snapshot_id"] == cur:
        return {**prev, "mode": "noop"}

    mode = "full"
    if prev is not None:
        ops = table.operations_between(prev["snapshot_id"], cur)
        if ops is not None and all(op in _DELTA_SAFE_OPS for op in ops):
            mode = "incremental"

    if mode == "incremental":
        delta = table.read_incremental(spark, prev["snapshot_id"], cur)
        stats = _merge(prev["stats"], _aggregate(delta))
    else:
        stats = _aggregate(table.read(spark, snapshot_id=cur))

    state = {"snapshot_id": cur, "mode": mode, "stats": stats}
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(state_path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, state_path)  # manifest-style atomic publish
    return state
