"""Z-order clustering rewrite (sources/iceberg.py::zorder).

The layout maintenance that makes manifest file skipping
multi-dimensional: after zorder(["a", "b"]), a range_filter on EITHER
column prunes files, because each rewritten file covers a contiguous
z-range and therefore a tight [min, max] box in both dimensions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable

N = 4000
TOP = (1 << 16) - 1


def _table(spark, root, n=N, seed=3, num_buckets=2):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, TOP + 1, n)
    b = rng.integers(0, TOP + 1, n)
    # pin the exact grid corners so rank scaling is the identity and
    # the python Morton twin predicts the engine's z exactly
    a[0], b[0], a[1], b[1] = 0, 0, TOP, TOP
    pdf = [(f"k-{i:06d}", int(a[i]), int(b[i])) for i in range(n)]
    df = spark.createDataFrame(pdf, "clip_id string, a long, b long")
    tbl = IcebergishTable(root, num_buckets=num_buckets)
    tbl.append(df)
    return tbl


def _morton2(a: np.ndarray, b: np.ndarray, bits: int = 16) -> np.ndarray:
    z = np.zeros(a.shape, dtype=np.int64)
    for i in range(bits):
        z |= (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
    return z


def test_files_sorted_by_morton_twin(spark, tmp_path):
    tbl = _table(spark, str(tmp_path / "t"))
    tbl.zorder(spark, ["a", "b"], files_per_bucket=4)
    snap = tbl.snapshot()
    assert snap["operation"] == "zorder"
    assert snap["summary"]["zorder_by"] == ["a", "b"]
    files = [r for fs in snap["bucket_files"].values() for r in fs]
    assert len(files) > 2  # the rewrite actually split buckets
    for rel in files:
        t = pq.read_table(os.path.join(tbl.data_dir, rel), columns=["a", "b"])
        z = _morton2(
            t.column("a").to_numpy().astype(np.int64),
            t.column("b").to_numpy().astype(np.int64),
        )
        assert (np.diff(z) >= 0).all(), f"{rel} not z-sorted"


def test_range_filter_prunes_on_both_dims(spark, tmp_path):
    """The z-curve guarantee: a predicate on the bottom quarter of
    EITHER dimension selects ~f·T + R files (R = the curve's scatter
    runs, small), while a plain single-column sort layout prunes only
    its own column. Both layouts carry identical rows."""
    tbl = _table(spark, str(tmp_path / "t"))
    tbl.zorder(spark, ["a", "b"], files_per_bucket=32)
    total = len(tbl.read(spark).inputFiles())
    assert total >= 48
    lo, hi = 0, TOP // 4  # bottom 25% of the dimension
    for col in ("a", "b"):
        pruned = tbl.read(spark, range_filter={col: (lo, hi)})
        n_files = len(pruned.inputFiles())
        assert n_files < total // 2, f"{col}: {n_files}/{total} files survived"
        # pruning is sound: predicate results identical to a full scan
        got = sorted(
            r.clip_id for r in pruned.where(F.col(col).between(lo, hi)).collect()
        )
        want = sorted(
            r.clip_id for r in tbl.read(spark).where(F.col(col).between(lo, hi)).collect()
        )
        assert got == want and got

    # contrast: sort-by-a layout cannot prune on b (b is uniform
    # within every a-slice) — the multi-dim win is the z-curve's
    srt = _table(spark, str(tmp_path / "s"))
    srt.zorder(spark, ["a"], files_per_bucket=32)
    s_total = len(srt.read(spark).inputFiles())
    on_a = len(srt.read(spark, range_filter={"a": (lo, hi)}).inputFiles())
    on_b = len(srt.read(spark, range_filter={"b": (lo, hi)}).inputFiles())
    assert on_a < s_total // 2
    assert on_b > 0.8 * s_total


def test_rows_preserved_and_time_travel(spark, tmp_path):
    tbl = _table(spark, str(tmp_path / "t"), n=500)
    pre_sid = tbl.current_snapshot_id()
    pre = sorted((r.clip_id, r.a, r.b) for r in tbl.read(spark).collect())
    sid = tbl.zorder(spark, ["a", "b"])
    assert sid != pre_sid
    post = sorted((r.clip_id, r.a, r.b) for r in tbl.read(spark).collect())
    assert post == pre
    # pinned readers still see the OLD layout (files unchanged)
    old = tbl.read(spark, snapshot_id=pre_sid)
    assert sorted((r.clip_id, r.a, r.b) for r in old.collect()) == pre
    assert set(old.inputFiles()) != set(tbl.read(spark).inputFiles())


def test_single_column_and_degenerate_inputs(spark, tmp_path):
    tbl = _table(spark, str(tmp_path / "t"), n=600)
    tbl.zorder(spark, ["a"], files_per_bucket=4)
    total = len(tbl.read(spark).inputFiles())
    pruned = tbl.read(spark, range_filter={"a": (0, TOP // 8)})
    assert len(pruned.inputFiles()) < total  # degenerates to sort clustering
    with pytest.raises(ValueError, match="at least one column"):
        tbl.zorder(spark, [])
    with pytest.raises(ValueError, match="not in table schema"):
        tbl.zorder(spark, ["nope"])
    # a constant column contributes nothing but must not break the rewrite
    const = tbl.read(spark).withColumn("c", F.lit(7).cast("long"))
    t2 = IcebergishTable(str(tmp_path / "t2"), num_buckets=2)
    t2.append(const.drop("bucket"))
    t2.zorder(spark, ["c", "a"])
    assert t2.read(spark).count() == 600
