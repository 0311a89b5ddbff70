"""Mahalanobis multivariate outliers (operators/multivariate.py):
fit matches numpy, jointly-inconsistent rows flag while marginally
ordinary, nulls/small cohorts never flag, and the clips pipeline's
class-I pairing errors light up through the joint dur×tokens lens."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.multivariate import (
    CHI2_4_999,
    fit_covariance,
    fit_covariance_trimmed,
    score_mahalanobis,
)


@pytest.fixture(scope="module")
def corr_frame(spark):
    """One cohort, two strongly correlated attrs + two noise attrs,
    plus a planted row sitting ON the marginals but OFF the joint."""
    rng = np.random.default_rng(11)
    n = 2000
    x = rng.normal(100.0, 10.0, n)
    y = 2.0 * x + rng.normal(0.0, 2.0, n)  # tight joint structure
    u = rng.normal(0.0, 1.0, n)
    v = rng.normal(50.0, 5.0, n)
    pdf = pd.DataFrame(
        {"g": "a", "x": x, "y": y, "u": u, "v": v, "row_id": np.arange(n)}
    )
    # planted: x at its median, y at ITS median — each |z| ≈ 0, but
    # jointly impossible (y should be ≈ 2x = 200, not 200-2·? ...):
    planted = {"g": "a", "x": 100.0, "y": 170.0, "u": 0.0, "v": 50.0, "row_id": -1}
    pdf = pd.concat([pdf, pd.DataFrame([planted])], ignore_index=True)
    return spark.createDataFrame(pdf)


ATTRS = ["x", "y", "u", "v"]


def test_fit_matches_numpy(spark, corr_frame):
    models = fit_covariance(corr_frame, ["g"], ATTRS)
    assert len(models) == 1
    m = models[0]
    pdf = corr_frame.toPandas()
    xs = pdf[ATTRS].to_numpy(dtype=float)
    assert m["n"] == len(pdf)
    assert np.allclose(m["mean"], xs.mean(axis=0), rtol=1e-9)
    assert np.allclose(m["cov"], np.cov(xs.T, bias=True), rtol=1e-7, atol=1e-7)


def test_joint_outlier_flags_while_marginals_ordinary(spark, corr_frame):
    models = fit_covariance(corr_frame, ["g"], ATTRS)
    out = score_mahalanobis(corr_frame, models, ["g"], ATTRS).toPandas()
    planted = out[out.row_id == -1].iloc[0]
    assert planted.mv_outlier, planted.md2
    # marginal z of the planted row is tiny on every axis
    pdf = corr_frame.toPandas()
    for a in ("x", "u", "v"):
        z = abs(planted[a] - pdf[a].mean()) / pdf[a].std()
        assert z < 1.0, (a, z)
    zy = abs(planted["y"] - pdf["y"].mean()) / pdf["y"].std()
    assert zy < 2.0  # y alone would never fire a z=6 rule
    # clean false-positive budget at the 1e-4 chi2 tail: ≤ 3 of 2000
    clean = out[out.row_id >= 0]
    assert clean.mv_outlier.sum() <= 3, clean.mv_outlier.sum()


def test_nulls_and_small_cohorts_never_flag(spark):
    rows = [("big", float(i % 7), float(i % 5), 1.0, 2.0) for i in range(100)]
    rows += [("tiny", 1.0, 2.0, 3.0, 4.0)] * 5  # below MIN_COHORT_N
    rows += [("big", None, 1.0, 1.0, 1.0)]  # null attr
    df = spark.createDataFrame(rows, "g string, x double, y double, u double, v double")
    models = fit_covariance(df, ["g"], ATTRS)
    assert {m["g"] for m in models} == {"big"}
    out = score_mahalanobis(df, models, ["g"], ATTRS).toPandas()
    assert not out[out.g == "tiny"].mv_outlier.any()
    assert out[out.g == "tiny"].md2.isna().all()
    assert not out[out.x.isna()].mv_outlier.any()


def test_degenerate_cohort_is_finite(spark):
    # constant column → singular covariance; ridge must keep scores finite
    rows = [("c", 1.0, float(i), float(i) * 2, 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, y double, u double, v double")
    models = fit_covariance(df, ["g"], ATTRS)
    out = score_mahalanobis(df, models, ["g"], ATTRS).toPandas()
    assert np.isfinite(out.md2.to_numpy(dtype=float)).all()


def test_clips_class_i_lights_up_jointly(spark):
    """End-to-end on the clips profile: transcript/audio pairing
    errors (class I) are exactly the joint dur×tokens inconsistency
    the multivariate lens exists for."""
    from bdqc_spark.plans.decide import flatten_profiles
    from bdqc_spark.plans.profile import profile_clips
    from bdqc_spark.synth.clips import generate_clips_df

    clips = generate_clips_df(spark, 1200, seed=42, include_labels=True)
    flat = flatten_profiles(
        profile_clips(clips.drop("lang_true", "anomaly"))
    ).where(F.col("pcm_ok"))
    attrs = ["dur_ms", "rms", "n_tokens", "speech_ratio"]
    # trimmed fit: the verbose class-I rows (40× transcripts) would
    # otherwise inflate the n_tokens variance and mask every other
    # anomaly (observed: untrimmed recall < 0.5 on this corpus)
    models = fit_covariance_trimmed(flat, ["codec", "lang_pred"], attrs)
    out = (
        score_mahalanobis(flat, models, ["codec", "lang_pred"], attrs)
        .select("clip_id", "md2", "mv_outlier")
        .toPandas()
        .merge(clips.select("clip_id", "anomaly").toPandas(), on="clip_id")
    )
    is_i = out.anomaly == "I"
    assert is_i.sum() > 0
    assert out[is_i].mv_outlier.mean() >= 0.5, out[is_i][["md2"]].describe()
    clean = out[out.anomaly == ""]
    assert clean.mv_outlier.mean() <= 0.02, clean.mv_outlier.mean()
