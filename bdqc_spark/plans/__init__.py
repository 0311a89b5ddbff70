from bdqc_spark.plans.profile import profile_clips
from bdqc_spark.plans.models import fit_cohort_models
from bdqc_spark.plans.decide import decide
from bdqc_spark.plans.pipeline import run_pipeline

__all__ = ["profile_clips", "fit_cohort_models", "decide", "run_pipeline"]
