"""Tar-shard (WebDataset-style) source/sink for audio+transcript corpora.

100 TB of audio rarely arrives as parquet: the de-facto interchange
format is tar shards whose members group per-sample files by basename
— ``<key>.<payload-ext>`` + ``<key>.txt`` + ``<key>.json`` — the
public WebDataset convention (github.com/webdataset/webdataset; the
grouping rule is "everything up to the first dot of the basename is
the sample key").  This module moves such shards in and out of the
engine's clips schema with stdlib ``tarfile`` only.

Read path (``read_tar_shards``): ``spark.read.format("binaryFile")``
over the shard glob → ONE ``mapInPandas`` pass parses each shard.
Python here is per-SHARD, not per-row: one sequential walk over an
in-memory byte stream per task — the same work any tar reader does,
amortized over the thousands of samples inside the shard.  Scale
shape: one shard = one task; shards are sized by the writer (the
public convention is 256 MB–1 GB) so tasks are balanced and a glob of
100k shards parallelizes trivially; no shuffle anywhere — the output
feeds the profile stage exactly like an Iceberg-ish scan.  With
``want_bytes=False`` the member payloads never enter the Arrow output
(header walk only) — the tar-side analogue of column pruning for
plans that only need transcripts/metadata.

Write path (``write_tar_shards``): the export/fixture sink.
Deterministic shard assignment by ``pmod(xxhash64(clip_id), n)`` (the
same stable-under-rerun rule as the table bucketing), members sorted
by key, zeroed mtime/uid/gid, metadata JSON with sorted keys — so a
shard's bytes are a pure function of its rows, and a resumed/retried
write commits idempotently via write-temp-then-rename (same contract
as the pipeline's bucket commits, plans/pipeline.py).

bdqc reads loose files from a directory scan (SURVEY.md §3.1 A1);
tar shards are the corpus-scale packaging of the same input, so this
source extends A1/S3 to the format a real 10^12-clip corpus ships in.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READ_FIELDS = (
    "clip_id string, bytes binary, payload_ext string, "
    "transcript string, meta string, shard string"
)
READ_COLS = ["clip_id", "bytes", "payload_ext", "transcript", "meta", "shard"]
_SIDECARS = {"txt", "json"}  # everything else is the payload


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset member naming: sample key = basename up to the FIRST
    dot; extension = the rest (may itself contain dots)."""
    base = os.path.basename(name)
    if "." not in base:
        return base, ""
    key, ext = base.split(".", 1)
    return key, ext


def _parse_shard(path: str, content: bytes, want_bytes: bool) -> list[dict]:
    shard = os.path.basename(path)
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tarfile.open(fileobj=io.BytesIO(content)) as tf:
        for m in tf:
            if not m.isreg():
                continue  # dirs / links / PAX headers
            key, ext = _split_key(m.name)
            if key not in samples:
                samples[key] = {
                    "clip_id": key,
                    "bytes": None,
                    "payload_ext": None,
                    "transcript": None,
                    "meta": None,
                    "shard": shard,
                }
                order.append(key)
            row = samples[key]
            if ext == "txt":
                row["transcript"] = tf.extractfile(m).read().decode("utf-8")
            elif ext == "json":
                row["meta"] = tf.extractfile(m).read().decode("utf-8")
            else:
                row["payload_ext"] = ext
                if want_bytes:
                    row["bytes"] = tf.extractfile(m).read()
    return [samples[k] for k in order]


def read_tar_shards(
    spark: SparkSession,
    path: str,
    want_bytes: bool = True,
    on_error: str = "fail",
) -> DataFrame:
    """Read WebDataset-style tar shards at ``path`` (file/dir/glob)
    into rows (clip_id, bytes, payload_ext, transcript, meta, shard).

    ``on_error='fail'`` (default) raises on a corrupt shard — a QC
    engine should not silently lose a shard; ``'skip'`` drops the bad
    shard and keeps the scan alive (bulk-ingest mode)."""
    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    cols = [c for c in READ_COLS if want_bytes or c != "bytes"]
    schema = ", ".join(
        f for f in READ_FIELDS.split(", ") if want_bytes or not f.startswith("bytes ")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(_parse_shard(path_, bytes(content), want_bytes))
                except (tarfile.TarError, UnicodeDecodeError, EOFError) as e:
                    if on_error == "fail":
                        raise ValueError(f"corrupt tar shard {path_}: {e}") from e
                    continue
            out = pd.DataFrame(rows, columns=READ_COLS)
            yield out[cols]

    return files.mapInPandas(_parse, schema)


def tar_to_clips(df: DataFrame) -> DataFrame:
    """Project tar-shard rows onto the engine's clips schema
    (clip_id, bytes, sr_hz, dur_ms, codec, transcript) — the ingest
    adapter between shards and the Iceberg-ish table. The payload
    member's extension is the codec (the member name is authoritative,
    matching the reference's extension-dispatch A2); sr_hz/dur_ms come
    from the JSON sidecar. Pure projection — no shuffle, no Python."""
    return df.select(
        "clip_id",
        "bytes",
        F.get_json_object("meta", "$.sr_hz").cast("int").alias("sr_hz"),
        F.get_json_object("meta", "$.dur_ms").cast("int").alias("dur_ms"),
        F.col("payload_ext").alias("codec"),
        "transcript",
    )


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    payload_ext_col: str = "codec",
) -> DataFrame:
    """Export ``df`` (requires ``clip_id``; optional ``bytes``,
    ``transcript``; every other column lands in the ``.json`` sidecar)
    as ``out_dir/shard-NNNNN.tar``.  Returns one row per written shard
    (shard, path, n_members, n_bytes).  Deterministic bytes: hash
    sharding, key-sorted members, zeroed tar metadata, sorted-key
    JSON.  ACTION: the returned DataFrame is lazy — count()/collect()
    it to execute the write."""
    if "clip_id" not in df.columns:
        raise ValueError("write_tar_shards requires a clip_id column")
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = [
        c
        for c in df.columns
        if c not in ("clip_id", "bytes", "transcript", "_shard")
    ]
    has_bytes = "bytes" in df.columns
    has_transcript = "transcript" in df.columns

    def _add(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(payload)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        tf.addfile(info, io.BytesIO(payload))

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("clip_id")
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = path + ".inprogress"
        n_bytes = 0
        with tarfile.open(tmp, "w") as tf:
            for row in pdf.itertuples(index=False):
                key = str(row.clip_id)
                if has_bytes and row.bytes is not None:
                    ext = str(getattr(row, payload_ext_col, "bin") or "bin")
                    payload = bytes(row.bytes)
                    _add(tf, f"{key}.{ext}", payload)
                    n_bytes += len(payload)
                if has_transcript and row.transcript is not None:
                    _add(tf, f"{key}.txt", str(row.transcript).encode("utf-8"))
                meta = {
                    c: (v.item() if hasattr(v := getattr(row, c), "item") else v)
                    for c in meta_cols
                }
                _add(
                    tf,
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True, ensure_ascii=False).encode(
                        "utf-8"
                    ),
                )
        os.replace(tmp, path)  # idempotent commit
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "path": path,
                    "n_members": len(pdf),
                    "n_bytes": n_bytes,
                }
            ]
        )

    return (
        df.withColumn("_shard", F.pmod(F.xxhash64("clip_id"), F.lit(n_shards)))
        .groupBy("_shard")
        .applyInPandas(_write, "shard int, path string, n_members long, n_bytes long")
    )
