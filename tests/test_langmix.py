"""Language-mixture / code-switch detection (operators/langmix.py)."""

from __future__ import annotations

import numpy as np

from bdqc_spark.functions.langid import synth_sentence
from bdqc_spark.operators.langmix import lang_mixture


def _sent(lang, seed, n=5):
    rng = np.random.default_rng(seed)
    # synth_sentence has no terminal punctuation; add one so the
    # segmenter sees sentence boundaries
    return " ".join(synth_sentence(rng, lang, 12) + "." for _ in range(n))


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r.asDict() for r in lang_mixture(df, "doc_id", "text").collect()}


def test_pure_and_mixed_docs_separate(spark):
    rows = [
        ("pure_en", _sent("en", 1, 6)),
        ("pure_de", _sent("de", 2, 6)),
        # 50/50 en/es interleave: the code-switch page
        ("mixed", _sent("en", 3, 3) + " " + _sent("es", 4, 3)),
    ]
    out = _run(spark, rows)
    assert out["pure_en"]["majority_lang"] == "en"
    assert not out["pure_en"]["is_mixed"]
    assert out["pure_en"]["lang_entropy"] == 0.0
    assert out["pure_de"]["majority_lang"] == "de"
    m = out["mixed"]
    assert m["is_mixed"] and m["n_segments"] == 6
    assert m["majority_frac"] <= 0.67
    assert m["lang_entropy"] > 0.5  # ~ln(2) for a clean 50/50


def test_minority_contamination_flagged(spark):
    # 1 of 5 sentences in another language: not "mixed" by the
    # majority gate (80%), exactly the threshold
    rows = [("c", _sent("fr", 5, 4) + " " + _sent("zh", 6, 1))]
    out = _run(spark, rows)
    assert out["c"]["majority_lang"] == "fr"
    assert out["c"]["n_segments"] == 5
    assert out["c"]["majority_frac"] == 0.8
    assert not out["c"]["is_mixed"]  # frac < 0.8 is strict


def test_two_segment_doc_never_mixed(spark):
    rows = [("d", _sent("en", 7, 1) + " " + _sent("es", 8, 1))]
    out = _run(spark, rows)
    assert out["d"]["n_segments"] == 2
    assert not out["d"]["is_mixed"]  # below the evidence floor


def test_empty_doc_absent(spark):
    rows = [("e", "   "), ("f", _sent("en", 9, 3))]
    out = _run(spark, rows)
    assert "e" not in out and "f" in out
