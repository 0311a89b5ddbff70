"""Exact-substring duplicate spans (operators/substr_dedup.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from bdqc_spark.operators.substr_dedup import (
    cut_duplicate_spans,
    duplicated_positions,
    exact_substring_spans,
)

L = 20


def _twin_spans(texts: dict[str, str], gram_len: int = L, min_count: int = 2):
    """Single-node reference: count every gram, mark positions, merge
    overlapping-or-contiguous islands. 1-based inclusive offsets."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        for i in range(len(t) - gram_len + 1):
            counts[t[i : i + gram_len]] += 1
    out = []
    for doc_id, t in texts.items():
        dup = [
            i + 1
            for i in range(len(t) - gram_len + 1)
            if counts[t[i : i + gram_len]] >= min_count
        ]
        start = prev_end = None
        n = 0
        for p in dup:
            if start is None:
                start, prev_end, n = p, p + gram_len - 1, 1
            elif p <= prev_end + 1:
                prev_end, n = max(prev_end, p + gram_len - 1), n + 1
            else:
                out.append((doc_id, start, prev_end, n))
                start, prev_end, n = p, p + gram_len - 1, 1
        if start is not None:
            out.append((doc_id, start, prev_end, n))
    return sorted(out)


def _rand_text(rng, n):
    import string

    return "".join(rng.choice(list(string.ascii_lowercase + " ")) for _ in range(n))


@pytest.fixture(scope="module")
def corpus():
    import random

    rng = random.Random(41)
    texts = {f"d{i}": _rand_text(rng, 150) for i in range(20)}
    shared = _rand_text(rng, 45)  # > 2 gram windows wide
    # plant the shared span mid-doc in three docs, at distinct offsets
    for i, off in (("d2", 10), ("d7", 60), ("d11", 100)):
        t = texts[i]
        texts[i] = t[:off] + shared + t[off:]
    # a within-doc repeat (suffix-array semantics: also duplicated)
    texts["d15"] = texts["d15"][:30] + shared[:25] + texts["d15"][30:80] + shared[:25]
    return texts


@pytest.fixture(scope="module")
def docs(spark, corpus):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
    )


def _got_spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in df.collect()
    )


def test_spans_match_twin_and_cover_planted(spark, corpus, docs):
    got = _got_spans(exact_substring_spans(docs, "doc_id", "text", gram_len=L))
    want = _twin_spans(corpus)
    assert got == want
    # the planted 45-char span is found in all three carrier docs
    carriers = {d for d, *_ in got}
    assert {"d2", "d7", "d11", "d15"} <= carriers
    # planted span is recovered at full width in d2 (offset 10, 1-based 11)
    d2 = [s for s in got if s[0] == "d2"]
    assert any(s[1] <= 11 and s[2] >= 11 + 45 - 1 for s in d2)


def test_hash_prefilter_is_exact(spark, corpus, docs):
    a = _got_spans(exact_substring_spans(docs, "doc_id", "text", gram_len=L, hash_prefilter=True))
    b = _got_spans(exact_substring_spans(docs, "doc_id", "text", gram_len=L, hash_prefilter=False))
    assert a == b


def test_clean_corpus_yields_nothing(spark):
    import random

    rng = random.Random(99)
    texts = {f"c{i}": _rand_text(rng, 120) for i in range(10)}
    assert _twin_spans(texts) == []  # random 20-grams don't collide
    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    assert exact_substring_spans(df, "doc_id", "text", gram_len=L).count() == 0


def test_short_docs_skipped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["same-short", "same-short"]})
    )
    # shorter than gram_len: no windows, no spans (the doc-level
    # dedup operators own that case)
    assert exact_substring_spans(df, "doc_id", "text", gram_len=L).count() == 0


def test_cut_removes_all_duplicated_windows(spark, corpus, docs):
    cut = cut_duplicate_spans(docs, "doc_id", "text", gram_len=L)
    pdf = cut.toPandas().set_index("doc_id")
    want = dict(_twin_cut(corpus))
    for doc_id, t in corpus.items():
        assert pdf.loc[doc_id, "text"] == want[doc_id]
        assert pdf.loc[doc_id, "n_cut"] == len(t) - len(want[doc_id])
    # untouched docs pass through byte-identical with n_cut 0
    spanned = {d for d, *_ in _twin_spans(corpus)}
    for doc_id in set(corpus) - spanned:
        assert pdf.loc[doc_id, "text"] == corpus[doc_id]
        assert pdf.loc[doc_id, "n_cut"] == 0


def _twin_cut(texts):
    spans = _twin_spans(texts)
    for doc_id, t in texts.items():
        mine = sorted((s, e) for d, s, e, _ in spans if d == doc_id)
        kept, prev = [], 0
        for s, e in mine:
            kept.append(t[prev : s - 1])
            prev = e
        kept.append(t[prev:])
        yield doc_id, "".join(kept)
