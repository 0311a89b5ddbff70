"""Benchmark decontamination: flag train docs overlapping an eval set.

The standard LLM-training hygiene step (public method: Brown et al.
2020 "GPT-3" appendix C; Dodge et al. 2021 C4 analysis): a training
document is CONTAMINATED if it shares at least one long n-gram with
any document in the held-out evaluation/benchmark set, because the
model would otherwise be scored on text it saw in training.

Here the unit is a character n-gram (default 13, the GPT-3 paper's
order of specificity) over the same normalized text form the dedup
family uses (``functions.text.normalized``).

Scale shape (the part that matters at 100 TB): the eval side is
reduced to its DISTINCT shingle set first — benchmarks are MBs while
the train corpus is TBs — so the join is train-shingles ⋈ a small
hashed set, never doc×doc. Each distinct (train doc, shingle) row
matches at most one eval-set row, so the join output is linear in
the train shingle count; Spark broadcasts the eval set when it fits
(and it always fits for real benchmarks). No UDFs — the shingling is
a Catalyst transform/explode, so it stays in whole-stage codegen.

bdqc has no decontamination surface (the reference QC-scans files in
isolation, SURVEY.md §3.1) — training-data-pipeline extension per
the builder brief, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_set(df: DataFrame, id_col: str, text_col: str, n: int = 13) -> DataFrame:
    """(id, sh): the distinct character n-grams of each document's
    normalized text. Documents shorter than n contribute nothing."""
    from bdqc_spark.functions.text import normalized

    t = normalized(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
                        ),
                        lambda i: t.substr(i, F.lit(n)),
                    )
                )
            ).alias("sh"),
        )
        .where(F.length("sh") == n)
    )


def embedding_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space decontamination: a train vector is contaminated
    when its cosine similarity to ANY eval vector reaches
    ``threshold`` (the semantic-overlap complement of the exact
    n-gram rule — paraphrased benchmark leakage that shares no
    13-gram; public method: near-duplicate filtering against eval
    sets, e.g. Lee et al. 2022 §6 discussion).

    Scale shape: eval sets are MBs while train is TBs, so the EVAL
    side is broadcast (BroadcastNestedLoopJoin — dense cosine has no
    equi-key) and the pass is linear in train rows, map-parallel.
    The only shuffle carries (id, cosine-scalar) pairs into the
    per-train-id max — partial aggregation reduces each partition to
    its local max first. Per-pair work is one zip_with/aggregate dot
    product in whole-stage codegen; norms are computed once per side
    beforehand (map-side projection), not once per pair.

    Output: (id, n_contaminating, max_cosine, contaminated) for every
    train row; vectors with zero norm (or empty arrays) never match.
    """
    dot = F.aggregate(
        F.zip_with("__t_emb", "__e_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(col):
        return F.sqrt(
            F.aggregate(
                col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )

    tr = train.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("__t_emb"),
        norm(F.col(emb_col)).alias("__t_n"),
    )
    ev = eval_set.select(
        F.col(emb_col).alias("__e_emb"), norm(F.col(emb_col)).alias("__e_n")
    ).where(F.col("__e_n") > 0)
    pairs = tr.where(F.col("__t_n") > 0).crossJoin(F.broadcast(ev))
    cos = dot / (F.col("__t_n") * F.col("__e_n"))
    hits = (
        pairs.select("id", cos.alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminating"),
            F.round(F.max("cos"), 6).alias("max_cosine"),
        )
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_contaminating", F.lit(0)).alias("n_contaminating"),
            F.col("max_cosine"),
            (F.coalesce("n_contaminating", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-train-doc contamination report against ``eval_set``:
    (id, n_shingles, n_hits, hit_ratio, contaminated). ``n_hits``
    counts the doc's distinct shingles that also occur anywhere in
    the eval set; ``contaminated`` is the standard any-overlap rule
    (n_hits >= 1). Train docs with no shingles (shorter than n after
    normalization) report 0 hits and are clean by definition."""
    tr_sh = shingle_set(train, id_col, text_col, n)
    ev_sh = shingle_set(eval_set, id_col, text_col, n).select("sh").distinct()
    hits = (
        tr_sh.join(ev_sh, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    sizes = tr_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        train.select(id_col)
        .join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) > 0,
                    F.coalesce("n_hits", F.lit(0))
                    / F.coalesce("n_shingles", F.lit(0)).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("hit_ratio"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
