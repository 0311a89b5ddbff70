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


def test_embedding_contamination_semantics(spark):
    """Planted near-duplicate vectors are flagged; orthogonal ones
    are not; counts and max cosine match a numpy brute-force twin;
    zero-norm vectors never match; the eval side is broadcast."""
    import numpy as np

    from bdqc_spark.operators.decontaminate import embedding_contamination

    rng = np.random.default_rng(7)
    ev = rng.normal(size=(5, 16)).astype(np.float32)
    tr = rng.normal(size=(20, 16)).astype(np.float32)
    tr[3] = ev[0] * 2.0 + rng.normal(scale=1e-3, size=16)  # near-dup (scaled)
    tr[7] = -ev[2]  # anti-parallel: cosine -1, must NOT flag
    tr[11] = 0.0  # zero norm: no evidence
    tdf = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(tr)],
        "vec_id long, embedding array<float>",
    )
    edf = spark.createDataFrame(
        [(100 + i, [float(v) for v in row]) for i, row in enumerate(ev)],
        "vec_id long, embedding array<float>",
    )
    out = embedding_contamination(tdf, edf, threshold=0.9).toPandas().set_index("vec_id")
    assert len(out) == 20

    trn = tr.astype(np.float64)
    evn = ev.astype(np.float64)
    tn = np.linalg.norm(trn, axis=1, keepdims=True)
    en = np.linalg.norm(evn, axis=1, keepdims=True)
    cos = np.zeros((20, 5))
    nz = (tn[:, 0] > 0)[:, None] & (en[:, 0] > 0)[None, :]
    cos[nz] = ((trn @ evn.T) / np.where(tn @ en.T == 0, 1, tn @ en.T))[nz]
    want_n = (np.where(nz, cos, -2) >= 0.9).sum(axis=1)
    for i in range(20):
        assert out.loc[i, "n_contaminating"] == want_n[i], i
        assert bool(out.loc[i, "contaminated"]) == (want_n[i] > 0)
    assert out.loc[3, "contaminated"] and not out.loc[7, "contaminated"]
    assert out.loc[11, "n_contaminating"] == 0
    assert abs(out.loc[3, "max_cosine"] - round(cos[3].max(), 6)) < 1e-9

    plan = (
        embedding_contamination(tdf, edf, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
