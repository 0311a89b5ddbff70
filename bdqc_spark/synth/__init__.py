from bdqc_spark.synth.clips import generate_clips_df, generate_clips_pandas
from bdqc_spark.synth.oracle import oracle_labels

__all__ = ["generate_clips_df", "generate_clips_pandas", "oracle_labels"]
