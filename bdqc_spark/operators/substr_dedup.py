"""Exact-substring duplicate spans (Lee et al. 2022, arXiv:2107.06499).

``dedup_exact``/MinHash/SimHash treat the DOCUMENT as the dedup unit;
the ExactSubstr result in "Deduplicating Training Data Makes Language
Models Better" shows the damage is often a shared SPAN inside
otherwise-distinct documents (boilerplate, licenses, quoted text).
The reference construction is a corpus-wide suffix array — a
single-machine data structure. The Spark-native re-expression:

  a position is DUPLICATED iff its ``gram_len``-char substring occurs
  ≥ ``min_count`` times in the corpus; overlapping-or-contiguous
  duplicated positions merge into maximal spans.

This is exactly the suffix-array criterion restated per-position, and
it decomposes into Catalyst operators:

  1. explode each doc into (pos, gram) — map-side only;
  2. find duplicated grams with one partial-agg count shuffle;
  3. keep duplicated positions (semi join);
  4. merge positions into maximal spans with the classic
     gaps-and-islands window (running max of span end), one per-doc
     partition — bounded by doc length, no skew.

Scale path (``hash_prefilter=True``, default): step 2's shuffle keys
are 8-byte ``xxhash64(gram)`` instead of the 50-byte gram — the same
prefilter-then-confirm contract as the bloom dedup operator: the hash
pass has NO false negatives, and survivors (a tiny fraction of
positions) are re-counted by the exact gram, so collisions can never
mark a unique span duplicated. Zero Python in any path.

``cut_duplicate_spans`` is the rewrite stage: it removes every
duplicated span from every document (the aggressive variant the
released ExactSubstr tooling applies; documented there as preferable
to keeping one arbitrary copy). One ``applyInPandas`` over docs
joined with their KB-sized span lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPAN_COLS = ("span_start", "span_end", "n_grams")


def _positions(docs: DataFrame, id_col: str, text_col: str, gram_len: int) -> DataFrame:
    """(doc_id, pos, gram) for every gram_len-char window; 1-based pos."""
    n_grams = F.length(F.col(text_col)) - F.lit(gram_len - 1)
    return (
        docs.where(F.length(F.col(text_col)) >= gram_len)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
            F.col(text_col).alias("_text"),
        )
        .select(
            "doc_id", "pos", F.substring(F.col("_text"), F.col("pos"), gram_len).alias("gram")
        )
    )


def duplicated_positions(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    gram_len: int = 50,
    min_count: int = 2,
    hash_prefilter: bool = True,
) -> DataFrame:
    """(doc_id, pos) of every position whose gram occurs ≥ min_count
    times corpus-wide (within-doc repeats count — the suffix-array
    semantics)."""
    pos = _positions(docs, id_col, text_col, gram_len)
    if hash_prefilter:
        # 8-byte shuffle keys; no false negatives, so the exact
        # re-count below only ever REMOVES collision survivors.
        dup_h = (
            pos.groupBy(F.xxhash64("gram").alias("h"))
            .agg(F.count("*").alias("c"))
            .where(F.col("c") >= min_count)
            .select("h")
        )
        pos = pos.join(dup_h, F.xxhash64(pos["gram"]) == dup_h["h"], "left_semi")
    dup_g = (
        pos.groupBy("gram").agg(F.count("*").alias("c")).where(F.col("c") >= min_count).select("gram")
    )
    return pos.join(dup_g, "gram", "left_semi").select("doc_id", "pos")


def exact_substring_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    gram_len: int = 50,
    min_count: int = 2,
    hash_prefilter: bool = True,
) -> DataFrame:
    """Maximal duplicated spans per doc: (doc_id, span_start,
    span_end, n_grams), 1-based inclusive char offsets. Overlapping or
    contiguous duplicated windows merge (a new span starts only when
    pos > previous running max end + 1)."""
    dup = duplicated_positions(docs, id_col, text_col, gram_len, min_count, hash_prefilter)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(gram_len - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)) + F.lit(1), 1).otherwise(0)
    island = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        dup.select("doc_id", "pos", island.alias("island"))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(gram_len - 1)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def cut_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    gram_len: int = 50,
    min_count: int = 2,
    hash_prefilter: bool = True,
) -> DataFrame:
    """Rewrite stage: every duplicated span is cut from every doc
    (docs with none pass through byte-identical). Adds ``n_cut``
    (chars removed). Span lists are KBs per doc — they ride a
    broadcast-or-shuffle left join; the cut itself is one vectorized
    pass per Arrow batch."""
    import pandas as pd

    spans = exact_substring_spans(docs, id_col, text_col, gram_len, min_count, hash_prefilter)
    per_doc = spans.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias("_spans")
    )
    joined = docs.join(per_doc, docs[id_col] == per_doc["doc_id"], "left").drop(
        per_doc["doc_id"]
    )

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_fields = [f for f in joined.schema.fields if f.name != "_spans"]
    schema = StructType(out_fields + [StructField("n_cut", IntegerType())])

    def _cut(pdf: pd.DataFrame) -> pd.DataFrame:
        texts, cuts = [], []
        for text, sp in zip(pdf[text_col], pdf["_spans"]):
            if sp is None or len(sp) == 0 or text is None:
                texts.append(text)
                cuts.append(0)
                continue
            kept, prev = [], 0
            for s in sp:  # sorted, disjoint (maximal islands)
                kept.append(text[prev : s["span_start"] - 1])
                prev = s["span_end"]
            kept.append(text[prev:])
            new = "".join(kept)
            texts.append(new)
            cuts.append(len(text) - len(new))
        res = pdf.drop(columns=["_spans"]).copy()
        res[text_col] = texts
        res["n_cut"] = cuts
        return res

    return joined.mapInPandas(lambda it: (_cut(p) for p in it), schema=schema)
