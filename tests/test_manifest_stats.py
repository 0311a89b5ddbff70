"""Manifest file-level column statistics (Iceberg's min/max manifest
stats, r5): every snapshot records per-file numeric [min, max] from
the parquet footers, and read(range_filter=...) skips files whose
range cannot intersect — the reader never lists, opens or plans them
(stronger than parquet row-group pushdown, which pays an open per
file). At 10^12 rows a time/duration-bounded job touches only the
files that might match.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 10).cast("int").alias("dur_ms"),
    )


def test_manifests_record_numeric_stats(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(_batch(spark, 0, 100))
    snap = tbl.snapshot()
    stats = snap["file_stats"]
    all_files = [r for fs in snap["bucket_files"].values() for r in fs]
    assert set(stats) == set(all_files)
    for st in stats.values():
        assert "x" in st and "dur_ms" in st
        assert st["x"][0] <= st["x"][1]
        # string columns are recorded too (truncated Iceberg-style)
        assert "clip_id" in st
        assert st["clip_id"][0].startswith("clip-")
    # global bounds match the data
    assert min(st["x"][0] for st in stats.values()) == 0.0
    assert max(st["x"][1] for st in stats.values()) == 99.0


def test_range_filter_skips_files(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(_batch(spark, 0, 100))         # x in [0, 99]
    tbl.append(_batch(spark, 1000, 100))      # x in [1000, 1099]

    full = tbl.read(spark)
    pruned = tbl.read(spark, range_filter={"x": (1000.0, None)})
    # the manifest dropped the first append's files before planning
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert len(pruned.inputFiles()) <= 4  # only the second append's files
    # file stats bound MIGHT-match: the caller still applies the
    # real predicate; here the pruned set happens to be exact
    got = sorted(r.clip_id for r in pruned.where(F.col("x") >= 1000).collect())
    want = sorted(f"clip-{i}" for i in range(1000, 1100))
    assert got == want

    # two-sided + open-ended bounds
    mid = tbl.read(spark, range_filter={"dur_ms": (500, 900)})
    got2 = sorted(r.clip_id for r in mid.where(F.col("dur_ms").between(500, 900)).collect())
    assert got2 == sorted(f"clip-{i}" for i in range(50, 91))


def test_missing_stats_are_conservative(spark, tmp_path):
    """A manifest without file_stats (pre-r5 table) must not skip
    anything."""
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    tbl.append(_batch(spark, 0, 50))
    sid = tbl.current_snapshot_id()
    path = os.path.join(tbl.meta_dir, f"snap-{sid}.json")
    m = json.load(open(path))
    del m["file_stats"]
    json.dump(m, open(path, "w"))
    pruned = tbl.read(spark, range_filter={"x": (10_000.0, None)})
    assert pruned.count() == 50  # nothing skipped without stats


def test_stats_survive_compact_and_delete(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    tbl.append(_batch(spark, 0, 60))
    tbl.append(_batch(spark, 60, 60))
    assert tbl.compact(spark) is not None
    snap = tbl.snapshot()
    files = [r for fs in snap["bucket_files"].values() for r in fs]
    assert set(snap["file_stats"]) == set(files)
    # compacted files carry fresh merged stats spanning both appends
    assert min(st["x"][0] for st in snap["file_stats"].values()) == 0.0
    assert max(st["x"][1] for st in snap["file_stats"].values()) == 119.0

    tbl.delete(spark, F.col("x") < 20)
    snap2 = tbl.snapshot()
    files2 = [r for fs in snap2["bucket_files"].values() for r in fs]
    assert set(snap2["file_stats"]) == set(files2)
    # the rewritten files' stats reflect the deletion
    assert min(st["x"][0] for st in snap2["file_stats"].values()) >= 20.0


def test_delete_with_scan_range_prunes_discovery(spark, tmp_path):
    """Range-bounded erasure (e.g. 'drop everything ingested in that
    window') prunes the discovery scan by manifest stats."""
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(_batch(spark, 0, 100))
    tbl.append(_batch(spark, 1000, 100))

    scanned = []
    orig_read = tbl.read

    def spy(spark_, buckets=None, range_filter=None, **kw):
        df = orig_read(spark_, buckets=buckets, range_filter=range_filter, **kw)
        scanned.append(len(df.inputFiles()))
        return df

    tbl.read = spy
    sid = tbl.delete(
        spark, F.col("x").between(1000, 1049), scan_range={"x": (1000.0, 1049.0)}
    )
    tbl.read = orig_read
    assert sid is not None
    assert scanned[0] <= 4  # discovery planned only the second append's files
    left = {r.clip_id for r in tbl.read(spark).collect()}
    assert len(left) == 150
    assert not any(f"clip-{i}" in left for i in range(1000, 1050))


def _codec_batch(spark, codec, lo, n):
    return spark.range(lo, lo + n).select(
        F.concat(F.lit("clip-"), F.col("id")).alias("clip_id"),
        F.lit(codec).alias("codec"),
        F.col("id").cast("double").alias("x"),
    )


def test_string_range_filter_skips_files(spark, tmp_path):
    """A codec-bounded read plans only the files whose recorded
    string bounds can intersect — dictionary-style pruning with no
    extra metadata structure."""
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=2)
    tbl.append(_codec_batch(spark, "flac", 0, 40))
    tbl.append(_codec_batch(spark, "pcm_s16le", 1000, 40))

    flac = tbl.read(spark, range_filter={"codec": ("flac", "flac")})
    assert flac.count() == 40
    assert set(r.codec for r in flac.select("codec").distinct().collect()) == {"flac"}
    # file-level proof: the pruned plan lists strictly fewer files
    all_files = len(tbl.read(spark).inputFiles())
    assert len(flac.inputFiles()) < all_files


def test_string_bounds_truncated_and_safe(spark, tmp_path):
    """Bounds longer than 16 chars truncate: lower = prefix, upper =
    incremented prefix — values sharing the 16-char prefix must still
    match (the truncated bound may only widen, never skip wrongly)."""
    long_id = "prefix-prefix-prefix-zzz"  # 24 chars
    df = spark.createDataFrame(
        [(long_id, 1.0), (long_id + "-2", 2.0)], "clip_id string, x double"
    )
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=1)
    tbl.append(df)
    st = next(iter(tbl.snapshot()["file_stats"].values()))
    lo, hi = st["clip_id"]
    assert len(lo) <= 16 and (hi is None or len(hi) <= 16)
    assert lo <= long_id
    assert hi is None or hi > long_id + "-2"
    # a range filter ON the full-length value still finds the file
    got = tbl.read(spark, range_filter={"clip_id": (long_id, long_id)})
    assert got.count() == 2  # file kept; caller applies the row predicate


def test_truncated_upper_bound_increment_carries():
    """The upper-bound increment carries left past the max code
    point; an all-U+10FFFF prefix degrades to unbounded (None)."""
    top = chr(0x10FFFF)
    lo, hi = IcebergishTable._truncated_str_bounds("a" * 20, "ab" + top * 20)
    assert lo == "a" * 16
    assert hi == "ac"  # the top code points carried away entirely
    lo2, hi2 = IcebergishTable._truncated_str_bounds("a", top * 20)
    assert hi2 is None
