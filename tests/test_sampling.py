"""Deterministic sampling / splitting / packing (operators/sampling.py).

Semantics gates: split fractions within binomial tolerance, exact
per-stratum sample sizes, bin-packing invariants (contiguity, bounded
overflow), determinism across repartitioning, and md5 parity with the
DuckDB oracle (the engine-neutrality the oracle queries rely on).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bdqc_spark.operators.sampling import (
    hash_split,
    mix_downsample,
    pack_bins,
    split_thresholds,
    stratified_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"lang{i % 3}", (i * 37) % 500 + 1)  # size in [1, 500]
        for i in range(5000)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, sz long")


def test_spark_md5_matches_hashlib(spark):
    got = (
        spark.range(1)
        .select(F.md5(F.lit("42|split-v1").cast("binary")).alias("h"))
        .first()
        .h
    )
    assert got == hashlib.md5(b"42|split-v1").hexdigest()


def test_split_fractions_and_determinism(docs):
    out = hash_split(docs, "doc_id").groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    # binomial 3-sigma at n=5000: 0.8±0.017, 0.1±0.013
    assert abs(counts["train"] / 5000 - 0.8) < 0.02
    assert abs(counts["val"] / 5000 - 0.1) < 0.015
    assert abs(counts["test"] / 5000 - 0.1) < 0.015
    # determinism under repartitioning: identical assignment
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(17), "doc_id").collect()
    }
    assert a == b
    # salt re-deals
    c = {r.doc_id: r.split for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert a != c


def test_split_thresholds_normalize_and_validate():
    ts = split_thresholds({"a": 2, "b": 2})
    assert ts[0][1] == format(int(0.5 * 2**32), "08x") and ts[1][1] == "g"
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.0})


def test_stratified_topk_exact_size_and_stability(docs):
    out = stratified_topk(docs, "lang", "doc_id", k=11).collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, set()).add(r.doc_id)
    assert {len(v) for v in per.values()} == {11}
    # stable under repartitioning
    out2 = stratified_topk(docs.repartition(13), "lang", "doc_id", k=11).collect()
    per2 = {}
    for r in out2:
        per2.setdefault(r.lang, set()).add(r.doc_id)
    assert per == per2
    # k larger than a stratum: returns the whole stratum, no padding
    tiny = docs.where(F.col("doc_id") < 5)
    assert stratified_topk(tiny, "lang", "doc_id", k=100).count() == 5


def test_stratified_topk_plans_window_group_limit(docs):
    plan = stratified_topk(docs, "lang", "doc_id", k=11)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_pack_bins_invariants(docs):
    budget = 4096
    out = pack_bins(docs, "doc_id", "sz", budget=budget, shard_col="lang").collect()
    # reconstruct per-shard hashed order and check the assignment rule
    by_shard = {}
    for r in out:
        key = hashlib.md5(f"{r.doc_id}|pack-v1".encode()).hexdigest()[:8]
        by_shard.setdefault(r.lang, []).append((key, r.doc_id, r.sz, r.bin_id))
    max_sz = max(r.sz for r in out)
    for rows in by_shard.values():
        rows.sort()
        cum = 0
        bins = {}
        for key, _doc, sz, bin_id in rows:
            assert bin_id == cum // budget  # the documented rule
            bins.setdefault(bin_id, 0)
            bins[bin_id] += sz
            cum += sz
        bin_ids = sorted(bins)
        # contiguous ids from 0
        assert bin_ids == list(range(len(bin_ids)))
        # every bin except the last reaches budget before closing, and
        # overflow is bounded by one item
        for b in bin_ids[:-1]:
            assert bins[b] >= budget - max_sz
            assert bins[b] < budget + max_sz


def test_pack_bins_no_shard(docs):
    out = pack_bins(docs.limit(100), "doc_id", "sz", budget=2048)
    n_bins = out.select("bin_id").distinct().count()
    total = out.agg(F.sum("sz")).first()[0]
    assert n_bins >= total // 2048  # at least the lower bound of bins


def test_mix_downsample_rebalances_to_smallest_stratum(spark):
    """Skewed strata (4000/800/200) are brought to ~uniform: each
    language keeps ≈ min_count docs (hash-threshold binomial
    tolerance), the smallest stratum is kept IN FULL, and membership
    is a pure per-row function — stable under repartitioning."""
    rows = (
        [(i, "big") for i in range(4000)]
        + [(10000 + i, "mid") for i in range(800)]
        + [(20000 + i, "small") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = mix_downsample(df, "lang", "doc_id")
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["small"] == 200  # rate 1 short-circuit: kept in full
    for lang in ("big", "mid"):
        assert 140 <= by_lang[lang] <= 260, by_lang  # ~Binomial(n, 200/n)
    # deterministic + partitioning-invariant membership
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in mix_downsample(df.repartition(17), "lang", "doc_id").collect())
    assert a == b
    # appending an unrelated stratum must not flip existing decisions
    # (same census for the old strata: new stratum is larger than min)
    df2 = df.union(spark.createDataFrame([(30000 + i, "xl") for i in range(5000)], "doc_id long, lang string"))
    c = sorted(r.doc_id for r in mix_downsample(df2, "lang", "doc_id").where(F.col("lang") != "xl").collect())
    assert c == a


# ---- weighted sampling without replacement (A-ES) -------------------------
def _ws_twin(rows, k, salt="wsample-v1"):
    """Single-node A-ES reference with the same md5 draw."""
    import math

    scored = []
    for key, w in rows:
        if w is None or w <= 0:
            continue
        h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 2**32
        scored.append((math.log(u) / w, key))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [key for _, key in scored[:k]]


def test_weighted_sample_matches_single_node_twin(spark):
    from bdqc_spark.operators.sampling import weighted_sample

    rows = [(f"d{i:03d}", float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 25).collect()]
    assert got == _ws_twin(rows, 25)


def test_weighted_sample_deterministic_and_salt_redeals(spark):
    from bdqc_spark.operators.sampling import weighted_sample

    rows = [(f"d{i}", 1.0 + i % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    a = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    b = [r["doc_id"] for r in weighted_sample(df.repartition(7), "doc_id", "w", 10).collect()]
    assert a == b  # partitioning-invariant
    c = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10, salt="v2").collect()]
    assert a != c  # salt re-deals


def test_weighted_sample_bias_toward_heavy_items(spark):
    """Across many salts, an item with 10x weight must be sampled
    far more often than a 1x item (probability-proportional check)."""
    from bdqc_spark.operators.sampling import weighted_sample

    rows = [("heavy", 10.0)] + [(f"light{i}", 1.0) for i in range(19)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    hits = 0
    for s in range(30):
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 3, salt=f"s{s}").collect()}
        hits += "heavy" in got
    # heavy holds ~10/29 of total weight; P(in top-3) ~ 0.75+. Light
    # items would hit ~3/20 of draws. 30 trials: expect >= 15.
    assert hits >= 15


def test_weighted_sample_edge_cases(spark):
    from bdqc_spark.operators.sampling import weighted_sample

    rows = [("a", 1.0), ("b", 0.0), ("c", -2.0), ("d", None), ("e", 3.0)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert got == {"a", "e"}  # nonpositive/null weights excluded; k > n returns all
    with pytest.raises(ValueError):
        weighted_sample(df, "doc_id", "w", 0)


def test_split_leakage_audit_counts_cross_split_pairs(spark):
    """The audit's (split_a, split_b) totals must reconcile exactly
    with the raw pair table joined to the split assignment."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    audit = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_leaks"])
        for r in entry.q_split_leakage_audit(spark, sf).collect()
    }
    pairs = entry.q_minhash_lsh_pairs(spark, sf).toPandas()
    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            entry._t(spark, sf, "documents").select("doc_id"), "doc_id"
        ).collect()
    }
    from collections import Counter

    want = Counter((splits[a], splits[b]) for a, b in zip(pairs.id_a, pairs.id_b))
    assert sum(n for n, _ in audit.values()) == len(pairs)
    for key, n in want.items():
        assert audit[key][0] == n
        assert audit[key][1] == (n if key[0] != key[1] else 0)
