"""Schema evolution contract (sources/iceberg.py::_evolved_schema):
appends may ADD columns; drops and type changes are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.sources.iceberg import IcebergishTable
from bdqc_spark.synth.clips import generate_clips_df


@pytest.fixture()
def table(spark, tmp_path):
    t = IcebergishTable(str(tmp_path / "t"), num_buckets=4)
    t.append(generate_clips_df(spark, 80, seed=21))
    return t


def test_add_column_append(spark, table):
    t = table
    s0 = t.current_snapshot_id()
    batch2 = generate_clips_df(spark, 40, seed=22).withColumn(
        "source", F.lit("webdataset")
    )
    t.append(batch2)
    cur = t.read(spark)
    assert "source" in cur.columns
    assert cur.count() == 120
    # old rows read the new column as null, new rows carry the value
    assert cur.where(F.col("source").isNull()).count() == 80
    assert cur.where(F.col("source") == "webdataset").count() == 40
    # time travel: the pre-evolution snapshot has the old schema
    old = t.read(spark, snapshot_id=s0)
    assert "source" not in old.columns and old.count() == 80
    # a third append WITHOUT the new column is a drop → refused
    with pytest.raises(ValueError, match="drops known column 'source'"):
        t.append(generate_clips_df(spark, 10, seed=23))


def test_drop_and_type_change_refused(spark, table):
    t = table
    with pytest.raises(ValueError, match="drops known column"):
        t.append(generate_clips_df(spark, 10, seed=24).drop("transcript"))
    with pytest.raises(ValueError, match="type change"):
        t.append(
            generate_clips_df(spark, 10, seed=25).withColumn(
                "dur_ms", F.col("dur_ms").cast("long")
            )
        )
    # nothing was committed by the refused appends
    assert t.read(spark).count() == 80


def test_incremental_across_evolution(spark, table):
    t = table
    s0 = t.current_snapshot_id()
    t.append(
        generate_clips_df(spark, 30, seed=26).withColumn("source", F.lit("s2"))
    )
    inc = t.read_incremental(spark, from_snapshot_id=s0)
    assert inc.count() == 30
    assert set(r[0] for r in inc.select("source").distinct().collect()) == {"s2"}
