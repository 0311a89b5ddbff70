"""Explain read-path (bdqc --explain, SURVEY.md §3.1 entry point 3):
per-(clip, fired rule) expected-vs-observed records must agree
rule-for-rule with decide()'s rule_hits."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bdqc_spark.plans.decide import decide
from bdqc_spark.plans.explain import explain_decisions
from bdqc_spark.plans.models import fit_cohort_models
from bdqc_spark.plans.profile import profile_clips
from bdqc_spark.plans.rules import DEVIATION_RULES, MIN_COHORT_N
from bdqc_spark.synth.clips import generate_clips_df


def test_explain_matches_decisions_rule_for_rule(spark):
    clips = generate_clips_df(spark, 800, seed=23)
    profiles = profile_clips(clips).cache()
    models = spark.createDataFrame(fit_cohort_models(profiles).collect())

    dec = decide(profiles, models).toPandas()
    exp = explain_decisions(profiles, models).toPandas()

    got = exp.groupby("clip_id")["rule_id"].apply(lambda s: sorted(s)).to_dict()
    want = {r.clip_id: list(r.rule_hits) for _, r in dec.iterrows() if not r.keep}
    kept = {r.clip_id for _, r in dec.iterrows() if r.keep}

    assert set(got) == set(want), "explain covers exactly the dropped clips"
    for cid, rules in want.items():
        assert got[cid] == rules, (cid, got[cid], rules)
    assert not kept & set(got)
    profiles.unpersist()

    # deviation rows carry a full model context and a super-threshold z
    thr = {r.rule_id: r.z_threshold for r in DEVIATION_RULES}
    drows = exp[exp.rule_id.isin(thr)]
    assert len(drows) > 0, "fixture produced no deviation fires"
    for _, r in drows.iterrows():
        assert r.expected_median == r.expected_median  # not NaN
        assert r.z > thr[r.rule_id] or math.isinf(r.z)

    # categorical rows carry the within-cohort frequency in z
    crows = exp[exp.rule_id == "categorical.rare_sr"]
    for _, r in crows.iterrows():
        assert 0.0 <= r.z < 0.01


def test_explain_respects_min_cohort_support(spark):
    # a tiny corpus: every cohort is below MIN_COHORT_N → no deviation
    # or categorical fires, only static rules appear
    clips = generate_clips_df(spark, 40, seed=29)
    profiles = profile_clips(clips)
    models = spark.createDataFrame(fit_cohort_models(profiles).collect())
    counts = (
        profiles.groupBy("codec", F.col("lang.pred")).count().agg(F.max("count")).collect()[0][0]
    )
    assert counts < MIN_COHORT_N, "fixture unexpectedly has a big cohort"
    exp = explain_decisions(profiles, models).toPandas()
    assert not exp.rule_id.str.startswith("robust_z").any()
    assert not exp.rule_id.str.startswith("categorical").any()
