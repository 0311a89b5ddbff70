"""Per-document language-mixture profiling (code-switch detection).

Document-level langid hides a real corpus failure mode: pages that
interleave languages (boilerplate in one, content in another;
scraped forums; wrongly-merged crawls). A monolingual-trained model
over the WHOLE doc reports the majority language with high
confidence and the minority text silently pollutes that language's
training split (the failure CCNet §4.1 routes around by classifying
per paragraph). This operator segments each doc at sentence
boundaries, language-identifies every segment with the engine's
hashed-trigram NB model (functions/langid.py), and aggregates a
mixture profile:

- ``majority_lang`` / ``majority_frac``: the dominant segment label
  and its share (``und`` segments count toward the denominator —
  unidentifiable text is still text);
- ``lang_entropy``: Shannon entropy (nats) of the segment-label
  distribution — 0 for pure docs, ln(2)≈0.69 for a 50/50 mix;
- ``is_mixed``: majority share < MIX_MAJORITY_MIN with at least
  MIX_MIN_SEGMENTS segments of evidence (a 2-segment doc can never
  be confidently "mixed").

Scale shape: segment explode + one Arrow-vectorized pandas UDF over
segments (the same batched scorer the doc-level row uses), then two
scalar aggregations keyed on doc_id — segment text never shuffles
(the UDF runs before the groupBy projects it away).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# sentence boundary: split AFTER terminal punctuation (lookbehind);
# rows-only operator, so the Java-regex-only lookbehind is fine here
SEG_SPLIT = r"(?<=[.!?])\s+"
MIX_MAJORITY_MIN = 0.8
MIX_MIN_SEGMENTS = 3


def lang_mixture(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id_col, n_segments, majority_lang, majority_frac,
    lang_entropy, is_mixed). Docs with no non-empty segment are
    absent (no evidence)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _seg_lang(texts: pd.Series) -> pd.Series:
        from bdqc_spark.functions.langid import predict_batch

        return predict_batch(texts)["pred"].astype(str)

    seg = (
        df.select(id_col, F.explode(F.split(F.col(text_col), SEG_SPLIT)).alias("seg"))
        .withColumn("seg", F.trim("seg"))
        .where(F.col("seg") != "")
        .select(id_col, _seg_lang(F.col("seg")).alias("pred"))
    )
    counts = seg.groupBy(id_col, "pred").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_segments"),
        # H = ln(N) - sum(c*ln c)/N from integer counts (exact terms)
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c")
        ).alias("lang_entropy"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("pred").asc())
    maj = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, F.col("pred").alias("majority_lang"), F.col("c").alias("maj_c"))
    )
    return (
        tot.join(maj, id_col)
        .select(
            id_col,
            "n_segments",
            "majority_lang",
            F.round(F.col("maj_c") / F.col("n_segments"), 6).alias("majority_frac"),
            F.round("lang_entropy", 6).alias("lang_entropy"),
            (
                (F.col("maj_c") / F.col("n_segments") < MIX_MAJORITY_MIN)
                & (F.col("n_segments") >= MIX_MIN_SEGMENTS)
            ).alias("is_mixed"),
        )
    )
