"""Snapshot-to-snapshot model drift (plans/drift.py) — bdqc's
temporal-QC loop: fit models on two corpus snapshots, flag the
cohort attributes that moved.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.plans.drift import categorical_drift, numeric_drift
from bdqc_spark.plans.models import fit_cohort_models
from bdqc_spark.plans.profile import profile_clips
from bdqc_spark.synth.clips import generate_clips_df


@pytest.fixture(scope="module")
def two_snapshots(spark):
    """Snapshot A: clips [0, 1500). Snapshot B: clips [1500, 3000)
    with dur_ms tripled for the dominant codec — a real upstream
    distribution shift (e.g. a new ingest source), not an injected
    profile row."""
    a = generate_clips_df(spark, 1500, seed=11)
    b_raw = generate_clips_df(spark, 1500, seed=11, start=1500)
    b = b_raw.withColumn(
        "dur_ms",
        F.when(F.col("codec") == "pcm_s16le", F.col("dur_ms") * 3).otherwise(
            F.col("dur_ms")
        ),
    )
    ma = fit_cohort_models(profile_clips(a))
    mb = fit_cohort_models(profile_clips(b))
    # materialize once — the model tables are KB-sized
    ma = spark.createDataFrame(ma.collect())
    mb = spark.createDataFrame(mb.collect())
    return ma, mb


def test_numeric_drift_flags_shifted_attribute(two_snapshots):
    ma, mb = two_snapshots
    out = numeric_drift(ma, mb).toPandas()
    hit = out[(out.attribute == "dur_ms") & (out.codec == "pcm_s16le")]
    assert len(hit) > 0
    measured = hit[hit.drifted.notna()]
    assert len(measured) > 0 and measured.drifted.all(), measured
    # the catalog column (sr_hz histogram attr is categorical; rms is
    # untouched) must NOT drift
    calm = out[(out.attribute == "rms") & out.drifted.notna()]
    assert not calm.drifted.any(), calm[calm.drifted]


def test_numeric_drift_same_distribution_is_calm(spark, two_snapshots):
    ma, _ = two_snapshots
    b = generate_clips_df(spark, 1500, seed=11, start=3000)
    mb = fit_cohort_models(profile_clips(b))
    out = numeric_drift(ma, mb).toPandas()
    measured = out[out.drifted.notna()]
    assert len(measured) > 0
    # same generator, disjoint index ranges: nothing should move
    assert not measured.drifted.any(), measured[measured.drifted]


def test_numeric_drift_structural_cohorts_are_null(two_snapshots):
    ma, mb = two_snapshots
    # drop one cohort entirely from the "new" snapshot → structural
    gone = mb.orderBy("codec", "lang_pred").limit(1).collect()[0]
    mb2 = mb.where(
        ~((F.col("codec") == gone.codec) & (F.col("lang_pred") == gone.lang_pred))
    )
    out = numeric_drift(ma, mb2).toPandas()
    row = out[(out.codec == gone.codec) & (out.lang_pred == gone.lang_pred)]
    assert len(row) > 0
    assert row.drifted.isna().all()
    assert row.median_new.isna().all()


def test_categorical_drift_tvd(spark, two_snapshots):
    ma, _ = two_snapshots
    # force a new sr mix in snapshot B: everything at 8 kHz
    b = generate_clips_df(spark, 1500, seed=11, start=1500).withColumn(
        "sr_hz", F.lit(8000)
    )
    mb = fit_cohort_models(profile_clips(b))
    out = categorical_drift(ma, mb, "sr_hz").toPandas()
    measured = out[out.drifted.notna()]
    assert len(measured) > 0
    # the dominant rate was 16 kHz → mix collapse is a large TVD
    assert measured.drifted.any()
    assert (measured.tvd <= 1.0).all() and (measured.tvd >= 0.0).all()


def test_categorical_drift_same_distribution_is_calm(spark, two_snapshots):
    ma, _ = two_snapshots
    b = generate_clips_df(spark, 1500, seed=11, start=4500)
    mb = fit_cohort_models(profile_clips(b))
    out = categorical_drift(ma, mb, "sr_hz").toPandas()
    measured = out[out.drifted.notna()]
    assert len(measured) > 0
    assert not measured.drifted.any(), measured[measured.drifted]
