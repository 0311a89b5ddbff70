"""SemDeDup (operators/semdedup.py) — no SQL oracle exists for
k-means, so semantics are gated here: exact parity with a pure-numpy
twin of the whole pipeline, planted-duplicate recall, determinism,
and the skew-cap fail-open contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from bdqc_spark.operators.semdedup import (
    _normalize,
    greedy_prune,
    kmeans_spherical,
    semdedup,
)

DIM = 16


def _corpus():
    """Three well-separated direction groups; inside each, a few
    planted near-duplicate packs (base + tiny noise) plus singletons."""
    rng = np.random.default_rng(123)
    bases = _normalize(rng.normal(size=(3, DIM)))
    # push the bases apart so clusters are unambiguous
    bases = _normalize(bases + 3.0 * np.eye(3, DIM))
    rows, dup_groups = [], []
    vid = 0
    for b in range(3):
        for g in range(3):  # 3 dup packs of 3 per group
            proto = _normalize((bases[b] + 0.25 * rng.normal(size=DIM))[None])[0]
            pack = []
            for _ in range(3):
                v = _normalize((proto + 0.005 * rng.normal(size=DIM))[None])[0]
                rows.append((vid, v))
                pack.append(vid)
                vid += 1
            dup_groups.append(pack)
        for _ in range(6):  # singletons
            v = _normalize((bases[b] + 0.35 * rng.normal(size=DIM))[None])[0]
            rows.append((vid, v))
            vid += 1
    return rows, dup_groups


def _df(spark, rows):
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], schema
    )


@pytest.fixture(scope="module")
def fitted(spark):
    rows, dup_groups = _corpus()
    # the embedding column is array<float> — quantize the twin's copy
    # to float32 so both sides see identical bits
    vecs = _normalize(
        np.asarray([v for _, v in rows]).astype(np.float32).astype(np.float64)
    )
    cents = kmeans_spherical(vecs, k=3, iters=10, seed=7)
    out = (
        semdedup(_df(spark, rows), dim=DIM, k=3, tau=0.97, centroids=cents)
        .orderBy("vec_id")
        .collect()
    )
    return rows, dup_groups, vecs, cents, out


def test_planted_dups_pruned_singletons_kept(fitted):
    rows, dup_groups, _, _, out = fitted
    keep = {r["vec_id"]: r["keep"] for r in out}
    for pack in dup_groups:
        assert sum(keep[i] for i in pack) == 1, f"dup pack {pack} not deduped to 1"
    dup_ids = {i for pack in dup_groups for i in pack}
    singles = [i for i, _ in rows if i not in dup_ids]
    assert all(keep[i] for i in singles), "a singleton was wrongly dropped"
    assert not any(r["capped"] for r in out)


def test_numpy_twin_parity(fitted):
    """The Spark plan must reproduce the pure-numpy pipeline exactly:
    same assignment, same per-cluster greedy keep set, same sims."""
    rows, _, vecs, cents, out = fitted
    ids = np.asarray([i for i, _ in rows])
    sims = vecs @ cents.T
    cl = np.argmax(sims, axis=1)
    simc = sims[np.arange(len(ids)), cl]
    exp_keep = {}
    exp_sim = {}
    for c in np.unique(cl):
        m = cl == c
        k_mask, k_sim = greedy_prune(ids[m], simc[m], vecs[m], tau=0.97)
        for i, kk, ss in zip(ids[m], k_mask, k_sim):
            exp_keep[int(i)] = bool(kk)
            exp_sim[int(i)] = float(ss)
    for r in out:
        assert r["cluster"] == int(cl[r["vec_id"]])
        assert r["keep"] == exp_keep[r["vec_id"]]
        assert r["sim_centroid"] == pytest.approx(float(simc[r["vec_id"]]), abs=1e-9)
        assert r["max_sim_kept"] == pytest.approx(exp_sim[r["vec_id"]], abs=1e-9)


def test_deterministic_rerun(spark, fitted):
    rows, _, _, _, out = fitted
    again = (
        semdedup(_df(spark, rows), dim=DIM, k=3, tau=0.97, seed=7)
        .orderBy("vec_id")
        .collect()
    )
    # trained-in-operator path (no injected centroids) is itself
    # deterministic: run twice → identical keep sets
    again2 = (
        semdedup(_df(spark, rows), dim=DIM, k=3, tau=0.97, seed=7)
        .orderBy("vec_id")
        .collect()
    )
    assert [r["keep"] for r in again] == [r["keep"] for r in again2]
    assert [r["cluster"] for r in again] == [r["cluster"] for r in again2]
    assert len(again) == len(out)


def test_skew_cap_fail_open(spark):
    rng = np.random.default_rng(5)
    base = _normalize(rng.normal(size=(1, DIM)))[0]
    rows = []
    for i in range(20):  # one fat cluster of near-dups
        rows.append((i, _normalize((base + 0.01 * rng.normal(size=DIM))[None])[0]))
    cents = np.asarray([base])
    out = (
        semdedup(_df(spark, rows), dim=DIM, k=1, tau=0.9, cap=5, centroids=cents)
        .orderBy("vec_id")
        .collect()
    )
    capped = [r for r in out if r["capped"]]
    in_cap = [r for r in out if not r["capped"]]
    assert len(capped) == 15 and len(in_cap) == 5
    # beyond the cap: fail-open keep, null max_sim
    assert all(r["keep"] and r["max_sim_kept"] is None for r in capped)
    # inside the cap the greedy pass still deduped the near-identical pack
    assert sum(r["keep"] for r in in_cap) == 1


def test_sampler_prefilter_engages_and_is_deterministic(spark):
    """r6: the centroid sampler pre-filters by hash threshold before
    the orderBy(hash)/limit (quality_clf pattern) — with sample_n
    below the filtered-subset size the prefilter branch engages; the
    trained result must stay deterministic across reruns."""
    rng = np.random.default_rng(9)
    rows = [(i, _normalize(rng.normal(size=(1, DIM)))[0]) for i in range(512)]
    a = (
        semdedup(_df(spark, rows), dim=DIM, k=2, tau=0.99, sample_n=4, seed=7)
        .orderBy("vec_id")
        .collect()
    )
    b = (
        semdedup(_df(spark, rows), dim=DIM, k=2, tau=0.99, sample_n=4, seed=7)
        .orderBy("vec_id")
        .collect()
    )
    assert [r["cluster"] for r in a] == [r["cluster"] for r in b]
    assert [r["keep"] for r in a] == [r["keep"] for r in b]
    assert len(a) == 512
