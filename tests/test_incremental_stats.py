"""Incremental materialized stats (plans/incremental_stats.py)."""

from __future__ import annotations

from bdqc_spark.plans.incremental_stats import load_stats, refresh_stats
from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


def _full_truth(spark, tbl):
    from pyspark.sql import functions as F

    rows = (
        tbl.read(spark)
        .groupBy("codec")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dur_ms").alias("s"))
        .collect()
    )
    return {r["codec"]: {"n_clips": r["n"], "dur_ms_sum": int(r["s"])} for r in rows}


def test_first_refresh_is_full_then_appends_go_incremental(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(generate_clips_df(spark, 150, seed=41))
    state_path = str(tmp_path / "stats.json")

    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "full"
    assert st["stats"] == _full_truth(spark, tbl)

    tbl.append(generate_clips_df(spark, 120, seed=42, start=150))
    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "incremental"
    assert st["stats"] == _full_truth(spark, tbl)

    # no new snapshot -> noop, state untouched
    st2 = refresh_stats(spark, tbl, state_path)
    assert st2["mode"] == "noop" and st2["stats"] == st["stats"]
    assert load_stats(state_path)["snapshot_id"] == tbl.current_snapshot_id()


def test_compaction_is_invisible_to_the_delta_path(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(generate_clips_df(spark, 100, seed=43))
    state_path = str(tmp_path / "stats.json")
    refresh_stats(spark, tbl, state_path)

    tbl.append(generate_clips_df(spark, 100, seed=44, start=100))
    tbl.compact(spark)  # rewrite snapshot: moves rows, adds none
    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "incremental"
    assert st["stats"] == _full_truth(spark, tbl)


def test_delete_in_range_falls_back_to_full(spark, tmp_path):
    from pyspark.sql import functions as F

    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(generate_clips_df(spark, 120, seed=45))
    state_path = str(tmp_path / "stats.json")
    refresh_stats(spark, tbl, state_path)

    tbl.delete(spark, F.col("dur_ms") > 1500)
    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "full"  # key-only changelog: no decrements
    assert st["stats"] == _full_truth(spark, tbl)

    # and the path after the fallback is incremental again
    tbl.append(generate_clips_df(spark, 80, seed=46, start=500))
    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "incremental"
    assert st["stats"] == _full_truth(spark, tbl)


def test_expired_lineage_falls_back_to_full(spark, tmp_path):
    tbl = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    tbl.append(generate_clips_df(spark, 90, seed=47))
    state_path = str(tmp_path / "stats.json")
    refresh_stats(spark, tbl, state_path)

    tbl.append(generate_clips_df(spark, 90, seed=48, start=90))
    tbl.append(generate_clips_df(spark, 90, seed=49, start=180))
    tbl.expire_snapshots(keep_last=1)  # consumer's from-snapshot gone
    st = refresh_stats(spark, tbl, state_path)
    assert st["mode"] == "full"
    assert st["stats"] == _full_truth(spark, tbl)
