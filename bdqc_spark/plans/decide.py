"""Stage 4 — decisions: rules + scrub (SURVEY.md §3.2 stage 4).

bdqc analogue: getOutliers/showOutliers (lib/BDQC/KB.pm,
reconstructed) — per-file deviation list + flag. Here: broadcast the
KB-sized cohort_models table onto the profiled rows (map-side only,
the big table is NOT shuffled), evaluate the compiled rule
expressions, and emit the `decisions` state table with the scrubbed
transcript. Everything below is Catalyst expressions — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bdqc_spark.functions.scrub import n_edits_column, scrub_column
from bdqc_spark.plans.models import COHORT_COLS, log_cps_column
from bdqc_spark.plans.rules import (
    CATEGORICAL_RULES,
    DEVIATION_RULES,
    MIN_COHORT_N,
    STATIC_RULES,
    CategoricalRule,
    DeviationRule,
    StaticRule,
)


def flatten_profiles(profiles: DataFrame) -> DataFrame:
    """Explode the nested signature structs into the flat namespace
    the rule expressions reference, including the derived deviation
    axes (log_ppl, log_cps) so decide() and explain() score the
    bit-identical expressions."""
    extra = [c for c in ("bucket",) if c in profiles.columns]
    flat = profiles.select(
        "clip_id",
        *extra,
        "codec",
        "sr_hz",
        "dur_ms",
        "transcript",
        F.col("lang.pred").alias("lang_pred"),
        F.col("lang.conf").alias("conf"),
        F.col("lang.ppl").alias("ppl"),
        F.col("audio.pcm_ok").alias("pcm_ok"),
        F.col("audio.dur_ms_decoded").alias("dur_ms_decoded"),
        F.col("audio.rms").alias("rms"),
        F.col("audio.clip_rate").alias("clip_rate"),
        F.col("audio.hdr_sr").alias("hdr_sr"),
        F.col("audio.speech_ratio").alias("speech_ratio"),
        F.col("audio.n_samples").alias("n_samples"),
        F.col("audio.bw_ratio").alias("bw_ratio"),
        F.col("audio.dc_off").alias("dc_off"),
        F.col("text.n_chars").alias("n_chars"),
        F.col("text.n_tokens").alias("n_tokens"),
        F.col("text.max_run").alias("max_run"),
    )
    # Derived deviation axes. ln(+inf) = +inf so no-evidence ppl rows
    # score z = inf (rules.py PPL_LOG_Z); log_cps is NULL on rows
    # without cross-modal evidence (models.log_cps_column).
    return flat.withColumn("log_ppl", F.log(F.col("ppl"))).withColumn(
        "log_cps",
        log_cps_column(
            F.col("pcm_ok"),
            F.col("n_chars"),
            F.col("speech_ratio"),
            F.col("dur_ms_decoded"),
        ),
    )


# Unresolved-Column cache for the rule/scrub expression trees: they
# are pure functions of the (frozen) rule tuples, but building them
# costs ~100 py4j round trips (~0.3-0.5s of driver time) — serial
# cost paid on EVERY decide() call at every cluster size. Keyed on
# the live SparkContext so a session restart (new JVM refs) rebuilds.
_EXPR_CACHE: dict = {}


def _static_decide_exprs(sc_key, static_rules, deviation_rules, categorical_rules):
    key = (sc_key, static_rules, deviation_rules, categorical_rules)
    cached = _EXPR_CACHE.get("decide")
    if cached is not None and cached[0] == key:
        return cached[1]
    static_hits = [
        F.when(F.expr(r.expr), F.lit(r.rule_id)).otherwise(F.lit(None)) for r in static_rules
    ]
    deviation_hits = []
    for r in deviation_rules:
        med, mad = F.col(f"{r.attribute}_median"), F.col(f"{r.attribute}_mad")
        x = F.col(r.attribute).cast("double")
        z = F.when(
            mad > 0, F.abs(x - med) / (F.lit(1.4826) * mad)
        ).otherwise(F.when(x == med, F.lit(0.0)).otherwise(F.lit(float("inf"))))
        # Cohorts below minimum support (or unmodeled: mad null)
        # are not flagged by deviation rules — matches bdqc, which
        # skips models for tiny cohorts (MIN_COHORT_N in rules.py).
        n_col = F.col(f"{r.attribute}_n")
        deviation_hits.append(
            F.when(
                med.isNotNull()
                & (n_col >= MIN_COHORT_N)
                & (z > F.lit(r.z_threshold)),
                F.lit(r.rule_id),
            ).otherwise(F.lit(None))
        )
    categorical_hits = []
    for r in categorical_rules or ():
        cn = F.col(f"__{r.attribute}_cn")
        cnt = F.coalesce(
            F.col(f"__{r.attribute}_hist")[F.col(r.attribute).cast("string")], F.lit(0)
        )
        categorical_hits.append(
            F.when(
                # null attribute values carry no frequency evidence and
                # are excluded from the fitted histogram (models.py) —
                # don't fire on them
                F.col(r.attribute).isNotNull()
                & cn.isNotNull()
                & (cn >= MIN_COHORT_N)
                & (cnt / cn < F.lit(r.rare_frac)),
                F.lit(r.rule_id),
            ).otherwise(F.lit(None))
        )
    scrub = scrub_column(F.col("transcript"))
    n_edits = n_edits_column(F.col("transcript"))
    exprs = (static_hits, deviation_hits, categorical_hits, scrub, n_edits)
    _EXPR_CACHE["decide"] = (key, exprs)
    return exprs


def decide(
    profiles: DataFrame,
    cohort_models: DataFrame,
    static_rules: tuple[StaticRule, ...] = STATIC_RULES,
    deviation_rules: tuple[DeviationRule, ...] = DEVIATION_RULES,
    categorical_rules: tuple[CategoricalRule, ...] = CATEGORICAL_RULES,
) -> DataFrame:
    """profiles + models → decisions(clip_id[, bucket], keep,
    rule_hits, scrubbed_transcript, n_scrub_edits)."""
    flat = flatten_profiles(profiles)

    # Monotonic session token (r3 ADVICE): id(_jsc) can be reused by a
    # new gateway object after the old one is GC'd, silently serving
    # Columns bound to a dead JVM. (applicationId, startTime) is unique
    # per SparkContext and changes on every in-process restart.
    sc = profiles.sparkSession.sparkContext
    sc_key = (sc.applicationId, sc.startTime)
    static_hits, deviation_hits, categorical_hits, scrub, n_edits = _static_decide_exprs(
        sc_key, static_rules, deviation_rules, categorical_rules
    )
    hit_exprs = list(static_hits)

    if deviation_rules:
        attrs = sorted({r.attribute for r in deviation_rules})
        wide = (
            cohort_models.where(F.col("attribute").isin(attrs))
            .groupBy(*COHORT_COLS)
            .pivot("attribute", attrs)
            .agg(
                F.first("median").alias("median"),
                F.first("mad").alias("mad"),
                F.first("n").alias("n"),
            )
        )
        flat = flat.join(F.broadcast(wide), on=COHORT_COLS, how="left")
        hit_exprs.extend(deviation_hits)

    for r in categorical_rules or ():
        # Broadcast the per-cohort value histogram; a row is flagged
        # when its value's within-cohort frequency is below rare_frac
        # (exact integer counts — identical on engine and oracle).
        hist = cohort_models.where(F.col("attribute") == r.attribute).select(
            *COHORT_COLS,
            F.col("n").alias(f"__{r.attribute}_cn"),
            F.col("histogram").alias(f"__{r.attribute}_hist"),
        )
        flat = flat.join(F.broadcast(hist), on=COHORT_COLS, how="left")
    hit_exprs.extend(categorical_hits)

    extra = [c for c in ("bucket",) if c in flat.columns]
    return (
        flat.withColumn(
            "rule_hits", F.array_sort(F.filter(F.array(*hit_exprs), lambda x: x.isNotNull()))
        )
        .withColumn("keep", F.size("rule_hits") == 0)
        .withColumn(
            "scrubbed_transcript",
            F.when(F.col("keep"), scrub).otherwise(F.lit(None)),
        )
        .withColumn(
            "n_scrub_edits",
            F.when(F.col("keep"), n_edits).otherwise(F.lit(0)).cast("int"),
        )
        .select("clip_id", *extra, "keep", "rule_hits", "scrubbed_transcript", "n_scrub_edits")
    )
