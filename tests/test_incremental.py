"""Incremental update semantics (reference entry point 2, SURVEY.md
§3.1): new snapshot → only NEW clips get profiled (append), models
refit over all, decisions recomputed over all."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bdqc_spark.plans.pipeline import run_pipeline
from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


def test_incremental_append_profiles_only_new_clips(spark, tmp_path):
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    tbl = IcebergishTable(root, num_buckets=4)

    snap_a = tbl.append(generate_clips_df(spark, 400, seed=21))
    run_pipeline(spark, tbl.read(spark), out, input_snapshot=snap_a)
    files_after_a = set(glob.glob(f"{out}/profiles/bucket=*/*.parquet"))
    assert spark.read.parquet(f"{out}/profiles").count() == 400

    # grow the corpus: 100 new clips → new snapshot
    snap_b = tbl.append(generate_clips_df(spark, 100, seed=21, start=400))
    assert snap_b != snap_a
    run_pipeline(spark, tbl.read(spark), out, input_snapshot=snap_b)

    profiles = spark.read.parquet(f"{out}/profiles")
    assert profiles.count() == 500  # appended, no duplicates
    assert profiles.select("clip_id").distinct().count() == 500
    # old profile files untouched (incremental = append, not rewrite)
    files_after_b = set(glob.glob(f"{out}/profiles/bucket=*/*.parquet"))
    assert files_after_a <= files_after_b
    assert len(files_after_b) > len(files_after_a)

    # decisions recomputed over the full corpus (models refit over all)
    decisions = spark.read.parquet(f"{out}/decisions")
    assert decisions.count() == 500
    assert decisions.select("clip_id").distinct().count() == 500

    # third run with the same snapshot: pure no-op
    res = run_pipeline(spark, tbl.read(spark), out, input_snapshot=snap_b)
    assert res.processed_buckets == []
    assert set(glob.glob(f"{out}/profiles/bucket=*/*.parquet")) == files_after_b


def test_incremental_decisions_match_fresh_run(spark, tmp_path):
    """Incremental (A then +B) must produce the same decisions as a
    fresh run over the full corpus."""
    root1, root2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    t1 = IcebergishTable(root1, num_buckets=4)
    s_a = t1.append(generate_clips_df(spark, 300, seed=31))
    run_pipeline(spark, t1.read(spark), out1, input_snapshot=s_a)
    s_b = t1.append(generate_clips_df(spark, 100, seed=31, start=300))
    run_pipeline(spark, t1.read(spark), out1, input_snapshot=s_b)

    t2 = IcebergishTable(root2, num_buckets=4)
    t2.append(generate_clips_df(spark, 300, seed=31))
    t2.append(generate_clips_df(spark, 100, seed=31, start=300))
    run_pipeline(spark, t2.read(spark), out2)

    a = (
        spark.read.parquet(f"{out1}/decisions")
        .select("clip_id", "keep", "rule_hits", "scrubbed_transcript")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(f"{out2}/decisions")
        .select("clip_id", "keep", "rule_hits", "scrubbed_transcript")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_resume_after_crash_between_stages_refits_models(spark, tmp_path):
    """ADVICE r1 (high): an incremental run that crashes after stage A
    appended the new snapshot's profiles but before stage B refit the
    models must NOT reuse the previous snapshot's model table on
    resume — that would commit decisions from stale cohort stats."""
    root, out = str(tmp_path / "tbl"), str(tmp_path / "out")
    out_fresh = str(tmp_path / "out_fresh")
    tbl = IcebergishTable(root, num_buckets=4)

    s_a = tbl.append(generate_clips_df(spark, 200, seed=51))
    run_pipeline(spark, tbl.read(spark), out, input_snapshot=s_a)

    s_b = tbl.append(generate_clips_df(spark, 200, seed=51, start=200))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(
            spark, tbl.read(spark), out, input_snapshot=s_b, fail_after_stage="profile"
        )
    run_pipeline(spark, tbl.read(spark), out, input_snapshot=s_b)

    # models must be refit over all 400 profiles, not reused from the
    # 200-profile snapshot
    models = spark.read.parquet(f"{out}/cohort_models")
    n_total = (
        models.where(F.col("attribute") == "dur_ms")
        .agg(F.sum("n").alias("s"))
        .collect()[0]["s"]
    )
    assert n_total == 400

    # and the resumed run's decisions must equal a fresh run's
    t2 = IcebergishTable(str(tmp_path / "tbl2"), num_buckets=4)
    t2.append(generate_clips_df(spark, 200, seed=51))
    t2.append(generate_clips_df(spark, 200, seed=51, start=200))
    run_pipeline(spark, t2.read(spark), out_fresh)
    a = (
        spark.read.parquet(f"{out}/decisions")
        .select("clip_id", "keep", "rule_hits")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(f"{out_fresh}/decisions")
        .select("clip_id", "keep", "rule_hits")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_time_travel_and_manifest_isolation(spark, tmp_path):
    """read() is manifest-driven: snapshot pinning gives time travel,
    and files never committed to a manifest (a crashed append's
    orphans) are invisible — directory listing would leak them."""
    import os

    from bdqc_spark.sources.iceberg import IcebergishTable
    from bdqc_spark.synth.clips import generate_clips_df

    root = str(tmp_path / "tt_tbl")
    tbl = IcebergishTable(root, num_buckets=4)
    s1 = tbl.append(generate_clips_df(spark, 100, seed=3))
    s2 = tbl.append(generate_clips_df(spark, 60, seed=5).withColumn(
        "clip_id", F.concat(F.lit("b2_"), F.col("clip_id"))
    ))

    assert tbl.read(spark).count() == 160
    assert tbl.read(spark, snapshot_id=s1).count() == 100  # time travel
    assert tbl.read(spark, snapshot_id=s2).count() == 160

    # incremental: exactly the rows committed between s1 and s2
    inc = tbl.read_incremental(spark, s1)
    assert inc.count() == 60
    assert all(r.clip_id.startswith("b2_") for r in inc.select("clip_id").collect())
    # no-op increment and full-read degradation
    assert tbl.read_incremental(spark, s2).count() == 0
    assert tbl.read_incremental(spark, None).count() == 160

    # orphan parquet (crashed append: data written, manifest never
    # committed) must be invisible to manifest-driven readers
    stray_dir = os.path.join(root, "data", "bucket=0")
    stray = tbl.read(spark, buckets=[0]).limit(5)
    stray.write.mode("append").parquet(os.path.join(str(tmp_path), "_stray"))
    import glob as _glob
    import shutil as _shutil

    src = _glob.glob(os.path.join(str(tmp_path), "_stray", "*.parquet"))[0]
    _shutil.copy(src, os.path.join(stray_dir, "part-orphan.parquet"))
    assert tbl.read(spark).count() == 160  # still the committed view
    assert spark.read.parquet(os.path.join(root, "data")).count() > 160  # the leak a listing scan would see

    # history walks the parent chain, newest first
    hist = tbl.history()
    assert [h["snapshot_id"] for h in hist] == [s2, s1]
    assert hist[0]["total_rows"] == 160 and hist[1]["total_rows"] == 100

    # manifest-level pruning returns only the requested buckets
    pruned = tbl.read(spark, buckets=[1, 2])
    assert set(r.bucket for r in pruned.select("bucket").distinct().collect()) <= {1, 2}


def test_schema_evolution_add_column(spark, tmp_path):
    """Iceberg add-column evolution: a later append carries a new
    column; merge_schema reads reconcile — old files surface it as
    null, and time-traveling to the pre-evolution snapshot shows the
    old schema."""
    from bdqc_spark.sources.iceberg import IcebergishTable
    from bdqc_spark.synth.clips import generate_clips_df

    tbl = IcebergishTable(str(tmp_path / "evo_tbl"), num_buckets=4)
    s1 = tbl.append(generate_clips_df(spark, 80, seed=7))
    evolved = generate_clips_df(spark, 40, seed=9).withColumn(
        "clip_id", F.concat(F.lit("v2_"), F.col("clip_id"))
    ).withColumn("speaker_id", F.xxhash64("clip_id") % 100)
    tbl.append(evolved)

    got = tbl.read(spark, merge_schema=True)
    assert "speaker_id" in got.columns
    assert got.count() == 120
    assert got.where(F.col("speaker_id").isNull()).count() == 80  # pre-evolution rows
    assert got.where(F.col("speaker_id").isNotNull()).count() == 40
    # the pre-evolution snapshot has no such column
    assert "speaker_id" not in tbl.read(spark, snapshot_id=s1).columns
