"""The end-to-end pipeline with per-partition checkpoint/resume
(SURVEY.md §3.2, §4.3; BASELINE.json:14 "resumable from checkpoint
with per-partition lineage + metrics").

bdqc analogue: the KB is the reference's resumability mechanism —
scan skips files already in the KB (lib/BDQC/KB.pm, reconstructed).
The engine replaces the single mutable JSON blob with append-only
state tables keyed by *bucket* (the hash(clip_id) partition):

  out/
    profiles/bucket=k/    stage-1 checkpoint (signatures per clip)
    cohort_models/        per-run model snapshot (KB "models")
    decisions/bucket=k/   final keep/drop + scrubbed transcript
    metrics/              per-bucket counters, appended per attempt
    lineage/              per-bucket completion records, appended

Resume = read lineage, anti-join completed buckets (J5), process the
remainder. Writes use dynamic partition overwrite so a re-run of a
half-written bucket is idempotent; rows are sorted by clip_id within
each bucket so re-runs produce content-identical decisions.

Scale shape: stage A is map-only over pending buckets (bytes never
leaves it); stage B shuffles only the tiny flat projection of
profile scalars; stage C is a broadcast join + map-side writes.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bdqc_spark.plans.decide import decide
from bdqc_spark.plans.models import fit_cohort_models
from bdqc_spark.plans.profile import profile_clips

LINEAGE_SCHEMA = (
    "partition_id int, input_snapshot string, attempt int, "
    "started_at timestamp, finished_at timestamp, status string"
)


class PipelineResult:
    def __init__(self, out_dir: str, run_id: str, processed_buckets: list[int]):
        self.out_dir = out_dir
        self.run_id = run_id
        self.processed_buckets = processed_buckets


def _completed(spark: SparkSession, lineage_dir: str, snapshot: str, status: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(lineage_dir)
            .where((F.col("input_snapshot") == snapshot) & (F.col("status") == status))
            .select("partition_id")
            .distinct()
            .collect()
        )
        return {r.partition_id for r in rows}
    except Exception:  # first run: lineage table doesn't exist yet
        return set()


def _append_lineage(
    spark: SparkSession,
    lineage_dir: str,
    buckets: list[int],
    snapshot: str,
    attempt: int,
    started_at: float,
    status: str,
) -> None:
    now = time.time()
    rows = [(int(b), snapshot, attempt, started_at, now, status) for b in buckets]
    df = spark.createDataFrame(rows, "partition_id int, input_snapshot string, attempt int, started_at double, finished_at double, status string")
    df = df.withColumn("started_at", F.timestamp_seconds("started_at")).withColumn(
        "finished_at", F.timestamp_seconds("finished_at")
    )
    df.write.mode("append").parquet(lineage_dir)


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    out_dir: str,
    input_snapshot: str = "snap-0",
    exact_models: bool = False,
    fail_after_stage: str | None = None,  # test hook: 'profile'|'models'
) -> PipelineResult:
    """Run (or resume) the full QC pipeline over a bucketed clips df.

    `clips` must carry a `bucket` int column (IcebergishTable.read
    provides it; IcebergishTable.with_bucket adds it).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    run_id = uuid.uuid4().hex[:12]
    profiles_dir = f"{out_dir}/profiles"
    models_dir = f"{out_dir}/cohort_models"
    decisions_dir = f"{out_dir}/decisions"
    metrics_dir = f"{out_dir}/metrics"
    lineage_dir = f"{out_dir}/lineage"

    all_buckets = sorted(r.bucket for r in clips.select("bucket").distinct().collect())

    # ---- Stage A: profile pending buckets (checkpointed) -----------------
    t0 = time.time()
    done_profile = _completed(spark, lineage_dir, input_snapshot, "profiled")
    pending = [b for b in all_buckets if b not in done_profile]
    attempt = 2 if done_profile else 1  # informational (resume marker)
    if pending:
        prof = profile_clips(clips.where(F.col("bucket").isin(pending)))
        (
            prof.repartition("bucket")
            .sortWithinPartitions("clip_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(profiles_dir)
        )
        _append_lineage(spark, lineage_dir, pending, input_snapshot, attempt, t0, "profiled")
    if fail_after_stage == "profile":
        raise RuntimeError("injected failure after profile stage")

    # ---- Stage B: fit cohort models over ALL profiles --------------------
    profiles = spark.read.parquet(profiles_dir)
    models = fit_cohort_models(profiles, exact=exact_models)
    models.coalesce(1).write.mode("overwrite").parquet(models_dir)
    models = spark.read.parquet(models_dir)
    if fail_after_stage == "models":
        raise RuntimeError("injected failure after models stage")

    # ---- Stage C: decide pending buckets (checkpointed) ------------------
    t1 = time.time()
    done_decide = _completed(spark, lineage_dir, input_snapshot, "committed")
    pending_d = [b for b in all_buckets if b not in done_decide]
    if pending_d:
        decisions = decide(profiles.where(F.col("bucket").isin(pending_d)), models)
        (
            decisions.repartition("bucket")
            .sortWithinPartitions("clip_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(decisions_dir)
        )
        # Per-bucket metrics (FIXTURES.md §3), appended per attempt.
        # Two-level agg: per (bucket, rule) counts → map, plus row counters.
        wall_ms = int((time.time() - t1) * 1000)
        d = spark.read.parquet(decisions_dir).where(F.col("bucket").isin(pending_d))
        rule_counts = (
            d.select("bucket", F.explode("rule_hits").alias("rule"))
            .groupBy("bucket", "rule")
            .count()
            .groupBy("bucket")
            .agg(F.map_from_entries(F.collect_list(F.struct("rule", "count"))).alias("dropped_by_rule"))
        )
        metrics = (
            d.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("rows_seen"),
                F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("rows_dropped"),
                F.sum("n_scrub_edits").alias("scrub_edits"),
            )
            .join(rule_counts, on="bucket", how="left")
            .select(
                F.col("bucket").alias("partition_id"),
                "rows_seen",
                "rows_dropped",
                F.coalesce("dropped_by_rule", F.map_from_arrays(F.array(), F.array())).alias(
                    "dropped_by_rule"
                ),
                "scrub_edits",
                F.lit(wall_ms).alias("wall_ms"),
                F.lit(run_id).alias("run_id"),
            )
        )
        metrics.write.mode("append").parquet(metrics_dir)
        _append_lineage(spark, lineage_dir, pending_d, input_snapshot, attempt, t1, "committed")

    return PipelineResult(out_dir, run_id, pending_d if pending_d else [])
