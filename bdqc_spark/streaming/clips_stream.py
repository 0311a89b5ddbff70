"""Streaming clips QC (SURVEY.md §7 M6): score a stream of clips
with the SAME batch code path via foreachBatch.

Deployment shape: cohort models are fit periodically by the batch
pipeline (plans/pipeline.py) and *applied* to the live stream —
profile + rules + scrub are pure map-side work, so streaming
micro-batches scale exactly like batch partitions. Checkpointing is
Structured Streaming's own (offset + sink commit log), giving
exactly-once file output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bdqc_spark.plans.decide import decide
from bdqc_spark.plans.profile import profile_clips


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

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        decisions = decide(profile_clips(batch_df), models)
        decisions.write.mode("append").parquet(out_dir)

    writer = (
        clips_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
