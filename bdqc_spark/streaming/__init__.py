from bdqc_spark.streaming.windows import (
    dedup_within_watermark,
    running_cohort_stats,
    sessionize,
    sliding_counts,
    tumbling_counts,
)
from bdqc_spark.streaming.clips_stream import make_batch_writer, stream_decide

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "sessionize",
    "dedup_within_watermark",
    "running_cohort_stats",
    "make_batch_writer",
    "stream_decide",
]
