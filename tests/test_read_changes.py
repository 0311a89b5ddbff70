"""CDC changelog (sources/iceberg.py::read_changes): per-op rows and
the replay invariant — applying the changes in order onto the FROM
snapshot reproduces the TO snapshot exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    t = IcebergishTable(str(tmp_path_factory.mktemp("cdc") / "t"), num_buckets=4)
    t.append(generate_clips_df(spark, 60, seed=51))
    s_from = t.current_snapshot_id()
    # 1) plain append
    t.append(
        generate_clips_df(spark, 15, seed=52).withColumn(
            "clip_id", F.concat(F.lit("a2-"), F.col("clip_id"))
        )
    )
    # 2) merge: 4 upserts + 6 inserts
    existing = (
        t.read(spark).where(~F.col("clip_id").startswith("a2-"))
        .orderBy("clip_id").limit(4).drop("bucket")
        .withColumn("transcript", F.lit("merged"))
    )
    fresh = generate_clips_df(spark, 6, seed=53).withColumn(
        "clip_id", F.concat(F.lit("m-"), F.col("clip_id"))
    )
    t.merge(spark, existing.unionByName(fresh))
    # 3) delete 5 rows
    victims = [
        r[0]
        for r in t.read(spark).orderBy(F.desc("clip_id")).limit(5)
        .select("clip_id").collect()
    ]
    t.delete_keys(spark, victims)
    # 4) update: redact a deterministic slice
    t.update(
        spark,
        F.col("clip_id").startswith("a2-") & (F.pmod(F.xxhash64("clip_id"), F.lit(3)) == 0),
        {"transcript": F.lit("REDACTED")},
    )
    # 5) compaction: must contribute NO change rows
    t.compact(spark)
    return t, s_from


def test_change_ops_and_counts(spark, scenario):
    t, s_from = scenario
    ch = t.read_changes(spark, s_from).toPandas()
    counts = ch.groupby("change_op").size().to_dict()
    assert counts["insert"] == 15 + 6
    assert counts["delete"] == 5
    n_updates = t.snapshot(
        [s for s in (h["snapshot_id"] for h in t.history())
         if t.snapshot(s)["operation"] == "update"][0]
    )["summary"]["updated_rows"]
    assert counts["update"] == 4 + n_updates  # merge upserts + update rows
    # delete rows carry only the key
    dels = ch[ch.change_op == "delete"]
    assert dels.transcript.isna().all() and dels.clip_id.notna().all()
    # change_seq is monotone with operation order: appends before deletes
    assert ch[ch.change_op == "insert"].change_seq.min() < dels.change_seq.min()


def test_replay_reproduces_target(spark, scenario):
    t, s_from = scenario
    key = "clip_id"
    base = t.read(spark, snapshot_id=s_from).drop("bucket")
    ch = t.read_changes(spark, s_from)
    seqs = sorted(r[0] for r in ch.select("change_seq").distinct().collect())
    for seq in seqs:
        step = ch.where(F.col("change_seq") == seq).cache()
        touched = step.select(key).distinct()
        new_rows = (
            step.where(F.col("change_op") != "delete")
            .drop("change_op", "change_seq", "bucket")
        )
        base = base.join(touched, key, "left_anti").unionByName(new_rows)
    want = t.read(spark).drop("bucket")
    got = sorted(map(tuple, base.drop("bytes").collect()))
    exp = sorted(map(tuple, want.drop("bytes").collect()))
    assert got == exp
    assert base.count() == want.count()


def test_broken_lineage_is_an_error(spark, scenario):
    t, _ = scenario
    with pytest.raises(Exception, match="lineage|no snapshot|broken"):
        t.read_changes(spark, "nonexistent-snapshot")
