"""Describe an Iceberg-shaped table from its metadata alone — the
"what state is my table in" CLI an operator runs before/after
maintenance, WAP publishes, or erasure jobs. No Spark session, no
data scan: everything comes from the manifests, refs and sidecars
(the same property that makes these answers instant at 10^12 rows).

    python tools/table_info.py --table /path/to/table [--snapshot SID]

Prints one JSON document: current snapshot + summary, schema,
partition spec, file/byte counts, per-bucket file histogram summary,
manifest stats coverage, full lineage (newest first), refs (branches/
tags), and streaming-sink watermarks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def describe(root: str, snapshot_id: str | None = None) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bdqc_spark.sources.iceberg import IcebergishTable

    tbl = IcebergishTable(root)
    snap = tbl.snapshot(snapshot_id)
    if snap is None:
        raise SystemExit(f"no snapshot at {root}")

    files = [rel for fs in snap["bucket_files"].values() for rel in fs]
    sizes = []
    missing = 0
    for rel in files:
        try:
            sizes.append(os.path.getsize(os.path.join(tbl.data_dir, rel)))
        except FileNotFoundError:
            missing += 1
    per_bucket = sorted(len(fs) for fs in snap["bucket_files"].values())
    fstats = snap.get("file_stats") or {}

    sinks = {}
    for entry in os.listdir(tbl.meta_dir):
        if entry.startswith("stream-sink-") and entry.endswith(".json"):
            with open(os.path.join(tbl.meta_dir, entry)) as f:
                sinks[entry[len("stream-sink-") : -len(".json")]] = json.load(f)

    return {
        "root": root,
        "snapshot_id": snap["snapshot_id"],
        "operation": snap["operation"],
        "timestamp_ms": snap["timestamp_ms"],
        "summary": snap["summary"],
        "schema": snap["schema"],
        "bucket_key": snap["bucket_key"],
        "num_buckets": snap["num_buckets"],
        "n_data_files": len(files),
        "missing_data_files": missing,
        "data_bytes": sum(sizes),
        "files_per_bucket": {
            "min": per_bucket[0] if per_bucket else 0,
            "max": per_bucket[-1] if per_bucket else 0,
        },
        "file_stats_coverage": round(
            sum(1 for r in files if r in fstats) / len(files), 4
        )
        if files
        else None,
        "history": tbl.history() if snapshot_id is None else None,
        "refs": tbl.refs(),
        "stream_sinks": sinks,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="describe an Iceberg-shaped table")
    ap.add_argument("--table", required=True)
    ap.add_argument("--snapshot", default=None, help="describe a pinned snapshot")
    args = ap.parse_args(argv)
    print(json.dumps(describe(args.table, args.snapshot), indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
