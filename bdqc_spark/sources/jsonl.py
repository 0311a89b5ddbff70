"""JSONL / JSONL.GZ document source and sink — the wire format text
corpora actually arrive in (one JSON object per line, gzip-compressed
shards: the Common Crawl / RedPajama / Dolma distribution shape).

Read path (``read_jsonl_documents``): ``spark.read.json`` with an
explicit schema (no sampling inference pass — at 10^5 shards the
inference job would read the corpus twice), PERMISSIVE mode with a
corrupt-record column so one mangled line degrades that ROW, never
the shard or the task — the same honest-degradation contract as the
audio decoders. Gzip is transparent (Hadoop codec by extension);
.gz files are not splittable, so at corpus scale parallelism = shard
count — which is how these corpora are sharded anyway (the writer
below emits hash-assigned shards for exactly that reason).

Rows map onto the engine's ``documents`` shape: ``doc_id`` is taken
from the record when present and otherwise derived deterministically
as xxhash64(text) — stable across re-reads, retries and cluster
sizes (a monotonic id would not be); ``n_chars`` is recomputed, not
trusted.

Write path (``write_jsonl_documents``): deterministic hash shard
assignment (pmod(xxhash64(doc_id), n) — same discipline as the tar
sink), one .json.gz file per shard directory part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the wire schema: everything optional except text; unknown extra
# keys in the JSON are simply not projected (schema-pruned read)
JSONL_SCHEMA = (
    "doc_id string, text string, lang string, source string, _corrupt string"
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def read_jsonl_documents(
    spark: SparkSession, path: str, id_fallback: bool = True
) -> DataFrame:
    """Read JSONL(.gz) shards at ``path`` (file/dir/glob) into the
    ``documents`` shape plus a ``corrupt`` flag column. Corrupt lines
    (unparseable JSON, or parseable JSON with no usable text) survive
    as corrupt=true rows with the raw line in ``raw`` — the caller
    decides whether to count, quarantine or drop them."""
    df = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        # plain recursive file listing: shard layouts are directory
        # trees (shard=K/part-*.json.gz), not Hive partitions — the
        # shard key is bookkeeping, not data
        .option("recursiveFileLookup", "true")
        .json(path)
    )
    bad = F.col("_corrupt").isNotNull() | F.col("text").isNull()
    doc_id = F.col("doc_id")
    if id_fallback:
        doc_id = F.coalesce(
            F.col("doc_id"), F.xxhash64(F.col("text")).cast("string")
        )
    return df.select(
        F.when(~bad, doc_id).alias("doc_id"),
        F.when(~bad, F.col("text")).alias("text"),
        F.when(~bad, F.coalesce(F.col("lang"), F.lit("und"))).alias("lang"),
        F.when(~bad, F.coalesce(F.col("source"), F.lit("jsonl"))).alias("source"),
        F.when(~bad, F.length("text")).cast("bigint").alias("n_chars"),
        bad.alias("corrupt"),
        F.col("_corrupt").alias("raw"),
    )


def jsonl_documents(spark: SparkSession, path: str) -> DataFrame:
    """The clean ``documents``-shaped frame (corrupt rows dropped) —
    feed straight into the text registry operators."""
    return read_jsonl_documents(spark, path).where(~F.col("corrupt")).select(*DOC_COLS)


def write_jsonl_documents(df: DataFrame, path: str, n_shards: int = 4) -> None:
    """documents-shaped frame → exactly ``n_shards`` gzip JSONL shard
    directories (``shard=K/part-*.json.gz``) with deterministic hash
    shard assignment (pmod(xxhash64(doc_id), n) — retry/cluster-size
    stable). ``partitionBy`` gives the shard→file bijection that a
    plain repartition cannot (hash of the shard VALUE collides);
    rows are sorted by doc_id within each shard so shard bytes are a
    pure function of their rows (same discipline as the tar sink)."""
    (
        df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).cast("int")
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .json(path)
    )
