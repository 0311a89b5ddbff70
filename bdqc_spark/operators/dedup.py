"""Deduplication operators for training-data pipelines.

Exact dedup is a hash-groupBy (see __spark_entry__.q_dedup_exact);
this module adds the *near*-dup family, built to scale:

- MinHash + LSH banding: shingle → 64 minhashes → band keys →
  bucket self-join on band key → estimate Jaccard from signature
  agreement. The only all-pairs work happens *within LSH buckets*,
  which is the standard way to keep near-dup detection sub-quadratic
  at corpus scale (the full cross-join never exists in the plan).
- SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dups have
  small Hamming distance, exact dups collide.

Everything is Catalyst expressions (xxhash64, explode, groupBy,
bitwise ops) — zero Python UDFs; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bdqc_spark.functions.text import normalized


def _shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Distinct character k-shingles of the normalized text."""
    t = normalized(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("_id"), t.alias("_t"))
        .select(
            "_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length("_t") - F.lit(k - 1), F.lit(1))),
                        lambda i: F.col("_t").substr(i, F.lit(k)),
                    )
                )
            ).alias("sh"),
        )
        .where(F.length("sh") == k)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, k: int = 5
) -> DataFrame:
    """(_id, mh: array<bigint>) — num_hashes MinHash values per doc.

    Double hashing: the shingle string is hashed ONCE
    (h0 = xxhash64(sh)), and the family members are xxhash64(h0, i)
    over the 8-byte value — an equally valid independent-ish family
    (standard double-hashing construction), but each member hashes 8
    bytes instead of re-hashing the string. Cuts both runtime (~20%)
    and — because the generated code is 64 long-hashes instead of 64
    string-hashes — first-run codegen time (~2.4× cold, measured at
    sf0.1). The min over a doc's shingles is a standard MinHash. One
    shuffle (groupBy id).
    """
    sh = _shingles(df, id_col, text_col, k).withColumn("h0", F.xxhash64("sh"))
    aggs = [F.min(F.xxhash64("h0", F.lit(i))).alias(f"mh{i}") for i in range(num_hashes)]
    sig = sh.groupBy("_id").agg(*aggs)
    return sig.select("_id", F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("mh"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    k: int = 5,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding, scored by signature
    agreement (an unbiased Jaccard estimate).

    Returns (id_a, id_b, jaccard_est) with id_a < id_b.

    Skew guard: a degenerate corpus (many identical / near-empty
    docs) can put N docs into one (band, key) bucket, making the
    self-join quadratic in N. Buckets larger than `max_bucket_size`
    are deterministically SPLIT into ceil(n/max) hash-assigned
    sub-buckets before the join: per-bucket work is bounded by
    O(max² · n/max) = O(n·max) instead of O(n²), while each member
    still pairs with ~max others — plenty to stitch duplicate
    clusters back together via connected_components(). Cross-sub
    pairs inside an oversized bucket are the (documented) recall
    cost of boundedness.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # localCheckpoint, not cache: two consumers (band keys + signature
    # re-join) share one materialization, and the checkpoint RDD is
    # GC-cleaned when this DataFrame goes out of scope — a .cache()
    # here is unreachable-unpersist for callers (r3 ADVICE).
    sig = minhash_signatures(df, id_col, text_col, num_hashes, k).localCheckpoint(eager=False)

    band_keys = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("mh", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # Bucket-size cap: only buckets ABOVE the cap matter, and that set
    # is tiny by definition (each holds > max_bucket_size docs), so it
    # broadcasts — normal corpora pay one map-side aggregate + a
    # broadcast left join, never a shuffle of band_keys.
    big = (
        band_keys.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > max_bucket_size)
    )
    n_sub = F.coalesce(
        F.ceil(F.col("_bn") / F.lit(max_bucket_size)).cast("long"), F.lit(1).cast("long")
    )
    # Sub-bucket assignment is salted by `band`: each band partitions
    # an oversized bucket differently, so sub-cliques from different
    # bands overlap and connected_components() re-merges the cluster.
    band_keys = band_keys.join(F.broadcast(big), on=["band", "key"], how="left").select(
        "_id", "band", "key", F.pmod(F.xxhash64("_id", F.col("band")), n_sub).alias("sub")
    )

    a, b = band_keys.alias("a"), band_keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    sa = sig.select(F.col("_id").alias("id_a"), F.col("mh").alias("mh_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("mh").alias("mh_b"))
    est = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(num_hashes)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_est", F.round(est, 6))
        .where(F.col("jaccard_est") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-pair → cluster resolution: (id, canonical_id) where
    canonical_id is the minimum id reachable in the pair graph.

    Iterative min-label propagation with pointer doubling: each round
    every node adopts min(own label, neighbours' labels), then labels
    are path-compressed through the label table (label := label's
    label) — convergence in O(log diameter) rounds, so max_iter=25
    covers even pathological chain-shaped clusters (2^25 diameter);
    convergence is still checked each round.

    Scale shape: the edge set (near-dup pairs) is orders of magnitude
    smaller than the corpus; each round is one shuffle of the edge
    list + one of the label table, with localCheckpoint() truncating
    the lineage so plans don't grow across rounds. The per-round
    convergence check aggregates a single long.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, labels.id == neighbor_min.src, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias("comp"),
        )
        # pointer doubling: comp := comp's comp (labels are node ids,
        # so every comp has a row) — halves remaining chain depth
        lookup = stepped.select(F.col("id").alias("comp"), F.col("comp").alias("cc"))
        new_labels = (
            stepped.join(lookup, on="comp", how="left")
            .select("id", F.coalesce(F.col("cc"), F.col("comp")).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("comp").alias("canonical_id"))


def hamming_neighbors_fp(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    max_bucket_size: int = 500,
    block_cols: tuple = (),
    carry_cols: tuple = (),
) -> DataFrame:
    """Generic Hamming-neighbor self-join over a 64-bit fingerprint
    column: pairs (id_a, id_b, hamming [, <carry>_a, <carry>_b]) with
    bit_count(fp_a XOR fp_b) <= max_hamming.

    Blocking is the classic block-permutation scheme (Manku et al.,
    WWW 2007 — public algorithm): split the 64-bit fingerprint into 4
    disjoint 16-bit blocks; by pigeonhole, any pair within Hamming
    distance ≤ 3 agrees EXACTLY on at least one block, so a per-block
    equi-join finds every qualifying pair (exact for max_hamming ≤ 3,
    never an all-pairs product), and the cheap bit_count(a XOR b)
    filter drops false candidates.

    `block_cols` are extra equality-blocking keys folded into the
    bucket (e.g. frame count for audio fingerprints: true re-encodes
    decode to the same length, and the extra key keeps buckets small
    on corpora whose fingerprints cluster). `carry_cols` ride along
    into the output as <name>_a / <name>_b for a caller-side verify
    stage (e.g. a spectral-profile distance).

    Skew guard: identical to minhash_lsh_pairs — oversized buckets
    (degenerate corpora: many identical items) are split into
    hash-assigned sub-buckets, bounding per-bucket join work at
    O(n·max) with the documented cross-sub recall cost; the cap list
    broadcasts. Everything is Catalyst (bit ops + bit_count), zero
    Python.
    """
    assert 0 <= max_hamming <= 3, "4-block scheme is exact only for distance <= 3"
    block_cols = list(block_cols)
    carry_cols = list(carry_cols)
    fps = fps.select(
        F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"), *block_cols, *carry_cols
    ).localCheckpoint(eager=False)
    blocks = fps.select(
        "_id",
        "_fp",
        *block_cols,
        *carry_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("_fp", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "_id", "_fp", *block_cols, *carry_cols,
        F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"),
    )

    bucket_keys = ["blk", "key", *block_cols]
    big = (
        blocks.groupBy(*bucket_keys)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > max_bucket_size)
    )
    n_sub = F.coalesce(
        F.ceil(F.col("_bn") / F.lit(max_bucket_size)).cast("long"), F.lit(1).cast("long")
    )
    blocks = blocks.join(F.broadcast(big), on=bucket_keys, how="left").select(
        "_id", "_fp", *block_cols, *carry_cols, "blk", "key",
        F.pmod(F.xxhash64("_id", F.col("blk")), n_sub).alias("sub"),
    )

    a, b = blocks.alias("a"), blocks.alias("b")
    cond = (
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a._id") < F.col("b._id"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            "hamming",
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry_cols],
        )
        .distinct()
    )


def simhash_neighbors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, hamming) with SimHash Hamming
    distance ≤ max_hamming — the consumer of simhash_fingerprints'
    blocking keys, completing the simhash near-dup path (pairs feed
    connected_components for cluster resolution). Delegates to the
    generic hamming_neighbors_fp block-permutation join.
    """
    # localCheckpoint inside hamming_neighbors_fp, not cache — see
    # minhash_lsh_pairs note (GC-cleaned vs unreachable-unpersist).
    fps = simhash_fingerprints(df, id_col, text_col)
    return hamming_neighbors_fp(
        fps, id_col, "simhash",
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash bigint, prefix16 int) — 64-bit SimHash over
    whitespace tokens. prefix16 (top 16 bits) is a ready-made
    blocking key for Hamming-neighbor search."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.regexp_extract_all(normalized(F.col(text_col)), F.lit(r"[^ ]+"), F.lit(0))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        shifted = F.shiftleft(term, i)
        fp = shifted if fp is None else fp.bitwiseOR(shifted)
    return bit_sums.select(
        F.col("_id").alias(id_col),
        fp.alias("simhash"),
    ).withColumn("prefix16", F.shiftrightunsigned("simhash", 48).cast("int"))
