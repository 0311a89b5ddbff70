"""Deterministic sampling / splitting / packing for training-data prep.

Every large-scale dataset pipeline needs three sampling primitives
that must be DETERMINISTIC (reproducible across reruns, resumable,
and auditable — the same properties the QC pipeline's bucket commits
give writes):

- ``hash_split``      train/val/test assignment by key hash
- ``stratified_topk`` fixed-size pseudo-random sample per stratum
- ``pack_bins``       sequence packing: items → ~budget-sized bins

None of them use Spark's ``sample()`` (nondeterministic across
retries/partitioning) or ``rand()`` (ditto). The randomness source is
``md5(key)`` — stable across engines, which also makes each operator
exactly expressible in ANSI SQL for the DuckDB oracle: both engines
produce the identical 32-char lowercase hex digest of the identical
UTF-8 bytes, and both compare ASCII hex strings byte-wise.

Scale shape: ``hash_split`` is a pure projection (map-only, no
shuffle — the 100 TB default). ``stratified_topk`` and ``pack_bins``
shuffle once on the stratum/shard key and run one window pass within
each group; Spark plans ``row_number() <= k`` as WindowGroupLimit
(rank pushdown: partial top-k before the shuffle), so a skewed
stratum never materializes more than k rows per map task.

bdqc has no sampling surface (the reference QC-scans every file,
SURVEY.md §3.1) — these extend the engine for the training-data
pipeline tier per the builder brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_hex(key, salt: str):
    """First 8 hex chars of md5(key || '|' || salt) — a uniform
    32-bit draw as a lowercase hex string. Kept as TEXT (not parsed
    to int) so the oracle comparison is engine-neutral: DuckDB and
    Spark both hash the same UTF-8 bytes and both compare ASCII
    strings byte-wise."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("|" + salt)).cast("binary")), 1, 8
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound), ...] — cumulative weight
    boundaries mapped onto the 32-bit hex line. The last bound is
    'ffffffff'+1 territory, i.e. catches everything."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    out, acc = [], 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        acc += w / total
        bound = "g" if i == len(items) - 1 else format(int(acc * 2**32), "08x")
        out.append((name, bound))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a deterministic ``split`` column ('train'/'val'/'test' by
    default) keyed on md5(key). Properties a training pipeline needs:
    stable under reruns, re-partitioning and incremental appends (a
    new clip's split never depends on what else is in the batch), and
    salt-versioned (changing the salt re-deals the assignment,
    auditable by name). Map-only: no shuffle, no rand()."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = _hash_hex(F.col(key_col), salt)
    expr = None
    for name, bound in reversed(split_thresholds(weights)):
        expr = (
            F.lit(name)
            if expr is None
            else F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
        )
    return df.withColumn("split", expr)


def stratified_topk(
    df: DataFrame, strata_col: str, key_col: str, k: int, salt: str = "sample-v1"
) -> DataFrame:
    """Deterministic pseudo-random sample of exactly min(k, |stratum|)
    rows per stratum: rank rows within each stratum by md5(key) and
    keep the first k. Unlike ``df.sampleBy`` this is exact-size,
    reproducible, and independent of partitioning. One shuffle on the
    stratum key; the window is a WindowGroupLimit (top-k pushdown),
    so map tasks pre-prune to k rows before shuffling."""
    h = _hash_hex(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def mix_downsample(
    df: DataFrame, stratum_col: str, key_col: str, salt: str = "mix-v1"
) -> DataFrame:
    """Deterministic dataset mixing: down-sample every stratum to the
    size of the smallest one (a uniform target mix — the degenerate
    but most common case of the DoReMi/Pile-style mixture recipes)
    with NO rand(): a row is kept iff its md5 hash draw falls under
    its stratum's acceptance rate ``min_count / count``.

    Properties a 100 TB mixing job needs: map-side selection (the
    per-stratum count table is KB-sized and broadcast back), exact
    reproducibility across reruns/retries/partitionings, and a
    membership decision that is a pure function of (key, salt, the
    stratum census) — appending unrelated strata never flips a kept
    row. The smallest stratum is kept in full (rate 1 short-circuits
    the hash compare, so the 2^32 threshold never overflows its 8 hex
    digits).

    Oracle-exact: both engines compute floor(min*2^32/count) from the
    same integer census and compare the same 8-hex-char md5 draw."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_cnt"))
    counts = counts.crossJoin(
        F.broadcast(counts.agg(F.min("_cnt").alias("_mn")))
    )
    thr = F.lpad(
        F.lower(
            F.hex(
                F.floor(F.col("_mn") * F.lit(4294967296.0) / F.col("_cnt")).cast(
                    "long"
                )
            )
        ),
        8,
        "0",
    )
    keep = (F.col("_cnt") == F.col("_mn")) | (
        _hash_hex(F.col(key_col), salt) < thr
    )
    return (
        df.join(F.broadcast(counts), on=stratum_col)
        .where(keep)
        .drop("_cnt", "_mn")
    )


def pack_bins(
    df: DataFrame,
    key_col: str,
    size_col: str,
    budget: int,
    shard_col: str | None = None,
    salt: str = "pack-v1",
) -> DataFrame:
    """Sequence packing: assign items to ~``budget``-sized bins in
    deterministic (hashed) order, never splitting an item. Bin i of a
    shard holds the consecutive run of items whose preceding sizes
    sum into [i*budget, (i+1)*budget): each bin fills to at least
    ``budget`` minus the straddling item, i.e. overflow is bounded by
    one item — the standard shard-local packer for LLM sequence
    construction (exact first-fit is inherently sequential; this
    linear scheme is its order-preserving distributed form).

    One shuffle on the shard key; within a shard it is a single
    running-sum window pass. ``bin_id`` = floor(cum_before / budget).
    """
    h = _hash_hex(F.col(key_col), salt)
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(h, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(size_col)).over(w), F.lit(0))
    return df.withColumn("bin_id", F.floor(cum_before / F.lit(budget)).cast("int"))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the A-ES
    scheme, Efraimidis & Spirakis 2006 "Weighted random sampling with
    a reservoir"): each row draws u = md5-uniform in (0,1) and scores
    ln(u)/w; the k LARGEST scores are the sample, which provably
    selects each item with probability proportional to its weight
    among the survivors at every step. The training-data use: sample
    a token-budgeted subset proportional to DSIR / dedup / quality
    weights, reproducibly.

    Determinism contract matches the module's other samplers: the
    draw is a pure function of (key, salt) — stable across reruns,
    partitioning and appends, salt-versioned re-deals.

    Scale shape: one map-side projection computes scores, the top-k
    is a distributed TakeOrdered (per-partition partial top-k, k rows
    per map task shuffle — never the corpus). Rows with weight <= 0
    or null are excluded (zero-weight items are unsampleable by
    definition; the caller sees them dropped, not erroring).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _hash_hex(F.col(key_col), salt)
    u = (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(2**32))
    score = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_score", score)
        .orderBy(F.col("es_score").desc(), F.col(key_col))
        .limit(k)
        .withColumn("es_score", F.round("es_score", 6))
    )
