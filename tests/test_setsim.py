"""Exact prefix-filtered set-similarity join (operators/setsim.py)."""

from __future__ import annotations

import random

import pytest

from bdqc_spark.operators.setsim import brute_force_pairs, similarity_join


def _run(spark, texts: dict, threshold=0.5):
    df = spark.createDataFrame(sorted(texts.items()), "doc_id string, text string")
    out = similarity_join(df, "doc_id", "text", threshold)
    return sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in out.collect())


def test_planted_near_dups_found_exactly(spark):
    texts = {
        "a": "the quick brown fox jumps over the lazy dog",
        "b": "the quick brown fox jumps over the lazy cat",  # 1 token swap
        "c": "completely different words entirely here now",
        "d": "quick brown fox jumps lazy dog the over",  # same set as a
    }
    got = _run(spark, texts, 0.5)
    assert got == brute_force_pairs(texts, 0.5)
    pairs = {(a, b) for a, b, _ in got}
    assert ("a", "d") in pairs  # identical sets -> jaccard 1.0
    assert ("a", "b") in pairs
    assert all("c" not in p for p in pairs)
    j = {(a, b): v for a, b, v in got}
    assert j[("a", "d")] == 1.0


@pytest.mark.parametrize("tau", [0.3, 0.5, 0.7, 0.9, 1.0])
def test_randomized_matches_brute_force_all_thresholds(spark, tau):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    texts = {}
    for d in range(40):
        n = rng.randint(3, 15)
        texts[f"d{d:02d}"] = " ".join(rng.sample(vocab, n))
    # plant exact and near duplicates
    texts["dup1"] = texts["d00"]
    texts["dup2"] = texts["d01"] + " extratoken"
    assert _run(spark, texts, tau) == brute_force_pairs(texts, tau)


def test_tokenization_normalizes_case_and_punct(spark):
    texts = {"a": "Hello, World! HELLO?", "b": "hello world"}
    got = _run(spark, texts, 0.9)
    assert got == [("a", "b", 1.0)]


def test_empty_and_no_token_docs_never_pair(spark):
    texts = {"a": "", "b": "...!!!", "c": "real text here"}
    assert _run(spark, texts, 0.1) == []


def test_threshold_validation(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            similarity_join(df, "doc_id", "text", bad)


def test_no_cartesian_product_in_plan(spark):
    df = spark.createDataFrame(
        [(str(i), f"tok{i} tok{i+1} tok{i+2}") for i in range(20)],
        "doc_id string, text string",
    )
    plan = similarity_join(df, "doc_id", "text", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stopword_heavy_corpus_exact(spark):
    # every doc shares hot stopwords; prefix filter must still be exact
    rng = random.Random(7)
    stop = "the of and a to in is it"
    texts = {
        f"s{d:02d}": stop + " " + " ".join(f"rare{rng.randint(0, 200)}" for _ in range(4))
        for d in range(30)
    }
    for tau in (0.5, 0.8):
        assert _run(spark, texts, tau) == brute_force_pairs(texts, tau)
