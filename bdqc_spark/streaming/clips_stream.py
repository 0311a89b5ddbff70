"""Streaming clips QC (SURVEY.md §7 M6): score a stream of clips
with the SAME batch code path via foreachBatch.

Deployment shape: cohort models are fit periodically by the batch
pipeline (plans/pipeline.py) and *applied* to the live stream —
profile + rules + scrub are pure map-side work, so streaming
micro-batches scale exactly like batch partitions.

Delivery semantics: Structured Streaming guarantees at-least-once
EXECUTION of a foreachBatch body (the built-in file sink's commit-log
exactly-once does NOT apply here), so the body itself must be
idempotent: decisions are partitioned by batch_id and written with
dynamic partition overwrite — a retried micro-batch rewrites its own
partition instead of appending duplicates. Combined with the offset
checkpoint this yields effective exactly-once output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bdqc_spark.plans.decide import decide
from bdqc_spark.plans.profile import profile_clips


def make_batch_writer(spark: SparkSession, models: DataFrame, out_dir: str):
    """The idempotent foreachBatch body: overwrite this batch_id's own
    partition (dynamic mode), so an at-least-once retry replaces its
    previous (possibly partial) output instead of appending to it."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        decisions = decide(profile_clips(batch_df), models)
        (
            decisions.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return _process


def stream_decide(
    spark: SparkSession,
    clips_stream: DataFrame,
    models: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """clips stream → decisions parquet sink, reusing batch stages.

    `models` is a static (pre-fit) cohort_models DataFrame — the
    batch pipeline refits it on schedule; the stream only scores.
    Returns the StreamingQuery (caller awaits termination).
    """
    _process = make_batch_writer(spark, models, out_dir)

    writer = (
        clips_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
