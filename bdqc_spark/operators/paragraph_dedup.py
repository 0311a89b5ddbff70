"""Paragraph-level corpus dedup (training-data pipeline op).

The RefinedWeb / MassiveText "line dedup" stage (Penedo et al. 2023,
arXiv:2306.01116 §3.2; Rae et al. 2021 App. A): web corpora carry
boilerplate paragraphs (cookie banners, nav footers, license blurbs)
repeated across millions of pages. Whole-document dedup never sees
them — the surrounding text differs — so the filter works at the
paragraph granularity: split each doc, count exact-normalized
paragraph occurrences CORPUS-WIDE, drop every occurrence of any
paragraph that appears ``min_count``-or-more times, and reassemble
the survivors in original order.

Scale shape (the 100 TB lens):
- The corpus-wide count shuffles 8-byte ``xxhash64`` keys, never
  paragraph text. Only paragraphs whose HASH is hot (a tiny fraction:
  boilerplate + collisions) re-shuffle their text for the exact
  confirm, so a hash collision can cost work but never correctness —
  a unique paragraph colliding with a hot hash is rescued by the
  (hash, text) group, and true duplicates always share a hash (no
  false negatives). Same prefilter-then-confirm discipline as
  ``operators/substr_dedup.py``.
- Reassembly is one groupBy(doc) of (pos, text) structs — the only
  shuffle that carries text, and it carries each surviving paragraph
  exactly once.
- Dropping ALL occurrences (not keep-first) is deliberate: keep-first
  would need a global arbitrary winner per paragraph (an extra
  total-order shuffle) and reintroduces the boilerplate once per
  corpus; MassiveText's rule drops the repeated content everywhere.

Docs with no non-empty paragraph after the split (empty text, pure
separators) have no paragraph rows and are absent from the output —
callers left-join back to the corpus if they need them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep_pattern: str = r"\n{2,}",
    min_count: int = 2,
    out_sep: str = "\n\n",
) -> DataFrame:
    """→ (id_col, n_paragraphs, n_dropped, text_deduped).

    ``sep_pattern`` is a regex; paragraphs are trimmed and empties
    discarded before counting, so separator run-length and leading/
    trailing whitespace never affect equality. ``min_count`` is the
    corpus-wide occurrence threshold at which a paragraph is dropped
    (within-doc repeats count toward it).
    """
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 would drop every paragraph)")
    p = (
        df.select(id_col, F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "para"))
        .withColumn("para", F.trim("para"))
        .where(F.col("para") != "")
        .withColumn("h", F.xxhash64("para"))
    )
    # corpus-wide count on the 8-byte hash only (map-side combined)
    hot = p.groupBy("h").agg(F.count("*").alias("hc")).where(F.col("hc") >= min_count)
    # The hot-hash list (true boilerplate + collisions, 8 bytes/entry)
    # is BROADCAST so both the semi (candidates) and the anti
    # (non-hot survivors) are map-side: paragraph text never shuffles
    # for rows whose hash isn't hot, and the exact (h, para) confirm
    # only ever sees hot rows — previously the anti-join keyed on the
    # paragraph TEXT itself, so if the dup set outgrew the broadcast
    # threshold the whole corpus's text re-shuffled (r5 VERDICT #6).
    # Regime bound: a corpus whose duplicated-HASH set alone exceeds
    # broadcast capacity (~hundreds of millions of distinct
    # boilerplate paragraphs) needs a partitioned variant; min_count
    # thresholds in practice keep this KB-MB sized.
    hot_h = hot.select("h")
    cand = p.join(F.broadcast(hot_h), "h", "left_semi")
    dup = (
        cand.groupBy("h", "para")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("h", "para")
    )
    non_hot = p.join(F.broadcast(hot_h), "h", "left_anti")
    kept = non_hot.unionByName(cand.join(dup, ["h", "para"], "left_anti"))
    tot = p.groupBy(id_col).agg(F.count("*").alias("n_paragraphs"))
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda x: x["para"]
            ),
            out_sep,
        ).alias("text_deduped"),
    )
    return tot.join(agg, id_col, "left").select(
        id_col,
        "n_paragraphs",
        (F.col("n_paragraphs") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_dropped"),
        F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
    )
