"""Exact all-pairs set-similarity join via prefix filtering.

AllPairs / PPJoin (Bayardo et al. 2007 "Scaling Up All Pairs
Similarity Search"; Xiao et al. 2008 PPJoin — public algorithms):
find EVERY pair of documents whose token-set Jaccard is >= tau,
exactly, without the all-pairs product and without the document-
frequency cap the blocked n-gram path needs (dropping hot shingles
changes the reported Jaccard; this operator's score is exact).

Losslessness (the prefix-filtering theorem): order every set by one
global token order; if Jaccard(x, y) >= tau then
|x ∩ y| >= tau·|x ∪ y| >= tau·max(|x|, |y|), so the
(|x| - ceil(tau·|x|) + 1)-prefixes of x and y must share at least one
token — a pair missed by the prefix join cannot clear the threshold.

Scale shape (the 100 TB lens):
- The global order is (document frequency asc, token asc) — no dense
  global rank (a corpus-wide row_number would single-partition the
  vocabulary); the (df, token) struct itself is the sort key, and the
  candidate join key is the raw token.
- Prefixes hold each set's RAREST tokens, so the candidate equi-join
  fans out per token by that token's df among PREFIX entries only —
  stopwords sit at the back of every large set and never join. Tiny
  sets whose prefix is a stopword are bounded by the length filter
  (partners confined to [tau·sz, sz/tau]).
- Verification joins the deduplicated candidate pairs back to the
  full sorted arrays and computes |intersect| with Catalyst array
  ops — zero Python end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id_col, tok): distinct lowercase alnum tokens per document
    (empty-token rows dropped; a doc with no tokens has no rows)."""
    return df.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda t: t != "",
                )
            )
        ).alias("tok"),
    )


def similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """→ (id_a, id_b, sz_a, sz_b, overlap, jaccard) for every pair
    with token-set Jaccard >= ``threshold`` (id_a < id_b, jaccard
    rounded to 6 dp). Exact: no sampling, no frequency cap."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    tok = tokenize(df, id_col, text_col)
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    # per-doc token array sorted by the global (df asc, tok asc) order
    sets = (
        tok.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_", "tok"))),
                lambda s: s["tok"],
            ).alias("arr")
        )
        .withColumn("sz", F.size("arr"))
    )
    # prefix length |x| - ceil(tau·|x|) + 1 (lossless, see module doc)
    prefix = sets.select(
        F.col(id_col).alias("id"),
        "sz",
        F.explode(
            F.slice("arr", 1, F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("int") + 1)
        ).alias("tok"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: tau·|x| <= |y| <= |x|/tau (implied by J >= tau)
            & (F.col("b.sz") * F.lit(threshold) <= F.col("a.sz"))
            & (F.col("a.sz") * F.lit(threshold) <= F.col("b.sz")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    fa = sets.select(F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"), F.col("sz").alias("sz_a"))
    fb = sets.select(F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"), F.col("sz").alias("sz_b"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("overlap", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("overlap") / (F.col("sz_a") + F.col("sz_b") - F.col("overlap")), 6),
        )
        .where(
            F.col("overlap")
            / (F.col("sz_a") + F.col("sz_b") - F.col("overlap"))
            >= F.lit(threshold)
        )
        .select("id_a", "id_b", "sz_a", "sz_b", "overlap", "jaccard")
    )


def brute_force_pairs(texts: dict, threshold: float) -> list[tuple]:
    """Single-node reference for tests: exact all-pairs Jaccard over
    the same tokenization. → sorted [(id_a, id_b, jaccard_6dp)]."""
    import re

    toks = {
        k: set(t for t in re.split(TOKEN_SPLIT, v.lower()) if t)
        for k, v in texts.items()
    }
    out = []
    ids = sorted(toks)
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            if not toks[x] or not toks[y]:
                continue
            o = len(toks[x] & toks[y])
            u = len(toks[x] | toks[y])
            j = o / u
            if j >= threshold:
                out.append((x, y, round(j, 6)))
    return sorted(out)
