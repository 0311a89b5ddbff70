"""Decontamination operator (operators/decontaminate.py): planted
overlaps are caught, clean docs pass, counts match a brute-force
single-node twin, and the eval side reduces to a distinct set before
the join (the 100 TB shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.decontaminate import contamination, shingle_set


@pytest.fixture(scope="module")
def frames(spark):
    eval_rows = [
        (1, "The quick brown fox jumps over the lazy dog tonight."),
        (2, "Benchmarks must never leak into the training corpus."),
    ]
    train_rows = [
        # verbatim copy of an eval doc -> contaminated
        (10, "The quick brown fox jumps over the lazy dog tonight."),
        # embeds an eval span mid-document -> contaminated
        (11, "preface text then the quick brown fox jumps over something"),
        # clean
        (12, "completely unrelated words about spark window functions"),
        # shorter than 13 normalized chars -> no shingles, clean
        (13, "tiny doc"),
    ]
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(train_rows, schema),
        spark.createDataFrame(eval_rows, schema),
    )


def _norm(s: str) -> str:
    import re

    s = re.sub(r"[.,;:!?'\"()\[\]{}<>@#$%^&*+=/\\|~`_-]", "", s.lower())
    return re.sub(r"[ \t\n\r]+", " ", s).strip()


def _brute(train_rows, eval_rows, n=13):
    ev = set()
    for _, t in eval_rows:
        t = _norm(t)
        ev.update(t[i : i + n] for i in range(max(len(t) - n + 1, 0)))
    out = {}
    for did, t in train_rows:
        t = _norm(t)
        shs = {t[i : i + n] for i in range(max(len(t) - n + 1, 0))}
        out[did] = (len(shs), len(shs & ev))
    return out


def test_planted_overlaps_and_brute_force_parity(frames):
    train, ev = frames
    got = {r.doc_id: r for r in contamination(train, ev).collect()}
    want = _brute(
        [(r.doc_id, r.text) for r in train.collect()],
        [(r.doc_id, r.text) for r in ev.collect()],
    )
    assert set(got) == set(want)
    for did, (n_sh, n_hits) in want.items():
        assert got[did].n_shingles == n_sh, did
        assert got[did].n_hits == n_hits, did
        assert got[did].contaminated == (n_hits > 0), did
    assert got[10].contaminated and got[11].contaminated
    assert not got[12].contaminated and not got[13].contaminated
    assert got[13].n_shingles == 0 and got[13].hit_ratio == 0.0
    # the verbatim copy is fully covered
    assert got[10].hit_ratio == 1.0


def test_shingle_set_is_distinct_per_doc(spark):
    df = spark.createDataFrame(
        [(1, "abcabcabcabcabcabcabc")], "doc_id long, text string"
    )
    rows = shingle_set(df, "doc_id", "text", n=3).collect()
    shs = [r.sh for r in rows]
    assert len(shs) == len(set(shs))
    assert set(shs) == {"abc", "bca", "cab"}


def test_join_is_against_distinct_eval_set(frames):
    train, ev = frames
    # duplicating the eval corpus must not change any count
    ev2 = ev.unionAll(ev)
    a = {r.doc_id: (r.n_hits, r.n_shingles) for r in contamination(train, ev).collect()}
    b = {r.doc_id: (r.n_hits, r.n_shingles) for r in contamination(train, ev2).collect()}
    assert a == b
