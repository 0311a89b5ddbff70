"""Ring-1 tests: langid accuracy, perplexity monotonicity, scrub
idempotence/exactness, MAD/quantile vs exact numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bdqc_spark.functions import langid, lm
from bdqc_spark.functions.scrub import scrub_python


def test_langid_accuracy_on_synthetic():
    rng = np.random.default_rng(99)
    texts, labels = [], []
    for lang in langid.LANGS:
        for _ in range(100):
            texts.append(langid.synth_sentence(rng, lang))
            labels.append(lang)
    res = langid.predict_batch(pd.Series(texts))
    acc = float((res["pred"].to_numpy() == np.array(labels)).mean())
    assert acc >= 0.98


def test_langid_short_and_empty():
    res = langid.predict_batch(pd.Series(["", "ab", None]))
    assert list(res["pred"]) == [langid.UNKNOWN] * 3
    assert list(res["conf"]) == [0.0] * 3


def test_ppl_gibberish_higher_than_clean():
    rng = np.random.default_rng(5)
    clean = pd.Series([langid.synth_sentence(rng, "en") for _ in range(40)])
    gib = pd.Series(
        ["".join(chr(int(c)) for c in rng.integers(33, 126, size=80)) for _ in range(40)]
    )
    assert lm.perplexity_batch(clean).mean() * 10 < lm.perplexity_batch(gib).mean()


def test_ppl_empty_is_inf():
    assert np.isinf(lm.perplexity_batch(pd.Series([""]))).all()


def test_scrub_rules_fire():
    s = "email a@b.co, phone 555-123-4567, ssn 123-45-6789, ip 10.0.0.1, card 1234567890123456, you frak"
    out, edits, hits = scrub_python(s)
    assert "<EMAIL>" in out and "<PHONE>" in out and "<SSN>" in out
    assert "<IP>" in out and "<ID>" in out and "<TOX>" in out
    assert edits == 6
    assert hits == sorted(["pii.email", "pii.phone", "pii.ssn", "pii.ip", "pii.id16", "tox.lexicon"])


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_scrub_idempotent(s):
    once, _, _ = scrub_python(s)
    twice, _, _ = scrub_python(once)
    assert once == twice


def test_scrub_clean_text_untouched():
    s = "a perfectly ordinary sentence with no secrets"
    out, edits, hits = scrub_python(s)
    assert out == s and edits == 0 and hits == []
