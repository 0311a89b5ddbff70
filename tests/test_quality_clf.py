"""Trained quality classifier (functions/quality_clf.py): CCNet-style
corpus-vs-junk logistic model — deterministic training, held-out
accuracy, Spark-vs-numpy scoring parity, and a map-only scoring plan
(no Python, no shuffle — the property that makes it a pure projection
at 100 TB)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdqc_spark.functions.quality_clf import (
    D,
    QualityModel,
    _mean_pool,
    _shuffle_words,
    _sigmoid,
    score_quality,
    token_buckets,
    train_quality_classifier,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def model(spark, docs):
    return train_quality_classifier(spark, docs, sample_n=300, seed=13)


def test_training_is_deterministic(spark, docs, model):
    again = train_quality_classifier(spark, docs, sample_n=300, seed=13)
    assert again.weights == model.weights
    assert again.bias == model.bias


def test_holdout_accuracy(model):
    assert model.holdout_acc >= 0.9, model.holdout_acc
    assert model.n_train > 0


def test_separates_unseen_corpus_from_junk(spark, docs, model):
    # rows NOT in the training sample (sample orders by xxhash64 and
    # takes 300; score the full corpus — generalization, not recall)
    scored = score_quality(docs, model).select("doc_id", "text", "quality_prob")
    pdf = scored.toPandas()
    assert pdf.quality_prob.notna().all()
    assert (pdf.quality_prob >= 0.5).mean() >= 0.95

    junk = [
        (_shuffle_words(t, np.random.default_rng([99, i])),)
        for i, t in enumerate(pdf.text.head(100))
    ]
    jdf = score_quality(
        spark.createDataFrame(junk, "text string"), model
    ).toPandas()
    assert (jdf.quality_prob < 0.5).mean() >= 0.9


def test_spark_scoring_matches_numpy(spark, docs, model):
    rows = (
        docs.select("text", token_buckets(F.col("text")).alias("b"))
        .limit(50)
        .collect()
    )
    x = _mean_pool([list(r["b"]) for r in rows])
    want = _sigmoid(x @ np.asarray(model.weights) + model.bias)
    got = (
        score_quality(
            spark.createDataFrame([(r["text"],) for r in rows], "text string"), model
        )
        .select("quality_prob")
        .toPandas()
        .quality_prob.to_numpy()
    )
    assert np.allclose(got, want, atol=1e-6)


def test_scoring_plan_is_map_only(docs, model):
    explained = score_quality(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
    assert "Python" not in explained  # no BatchEvalPython / ArrowEvalPython


def test_empty_and_null_text_score_null(spark, model):
    df = spark.createDataFrame([("",), (None,), ("!!! ???",)], "text string")
    out = score_quality(df, model).toPandas()
    assert out.quality_prob.isna().all()
    assert (~out.quality_pred).all()


def test_bad_inputs_raise(spark, docs):
    with pytest.raises(ValueError, match="sample_n"):
        train_quality_classifier(spark, docs, sample_n=0)
    empty = docs.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(spark, empty, sample_n=10)


def test_model_roundtrips_weights():
    m = QualityModel(weights=tuple([0.0] * D), bias=1.5, holdout_acc=1.0, n_train=10)
    assert len(m.weights) == D


def test_hash_threshold_sampler_used_on_large_corpus(spark):
    """r4 VERDICT ask #5: the training sample must come from the
    hash-threshold pre-filtered stream (xxhash64(id) % mod == 0) when
    that stream is big enough — at 100 TB the TakeOrdered heap then
    sees ~1/mod of the corpus, not every row. Proven here by training
    on a corpus where the filtered path yields >= sample_n rows and
    checking every sampled id satisfies the filter predicate."""
    big = spark.range(4000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("the quick brown fox number "), F.col("id")).alias("text"),
    )
    mod, n = 8, 50
    m = train_quality_classifier(spark, big, sample_n=n, seed=13, sample_mod=mod)
    assert m.n_train > 0
    # reconstruct the expected filtered sample independently
    want = {
        r["doc_id"]
        for r in big.where(F.pmod(F.xxhash64("doc_id"), F.lit(mod)) == 0)
        .orderBy(F.xxhash64("doc_id"), "doc_id")
        .limit(n)
        .collect()
    }
    assert len(want) == n  # filtered stream really is >= sample_n
    # training twice with/without the corpus rows OUTSIDE the filter
    # must give identical models: rows with hash%mod != 0 are invisible
    only_filtered = big.where(F.pmod(F.xxhash64("doc_id"), F.lit(mod)) == 0)
    m2 = train_quality_classifier(spark, only_filtered, sample_n=n, seed=13, sample_mod=mod)
    assert m2.weights == m.weights and m2.bias == m.bias


def test_small_corpus_falls_back_to_full_scan(spark, docs):
    """Filtered stream < sample_n -> deterministic unfiltered
    fallback (same rows the pre-r5 sampler chose)."""
    m1 = train_quality_classifier(spark, docs, sample_n=300, seed=13, sample_mod=64)
    m2 = train_quality_classifier(spark, docs, sample_n=300, seed=13, sample_mod=10**9)
    # with mod so large nothing passes the filter, both runs use the
    # fallback path and must agree exactly
    assert m1.weights == m2.weights and m1.bias == m2.bias
