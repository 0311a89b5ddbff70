"""Stage 1 — per-clip profiling (SURVEY.md §3.2 stage 1).

The bdqc analogue is calcSignatures (lib/BDQC/KB.pm →
FileSignature/{Generic,Text,Binary}.pm, reconstructed): one pass per
file computing the nested signature map. Here: ONE map-side stage
over the clips table producing `audio`, `text`, `lang` structs —
no shuffle, and `bytes` is consumed *inside* this stage and never
materialized past it (column pruning keeps it out of every
downstream plan — the single most important property at 100 TB).

Python crossings: exactly two Arrow-batched pandas UDFs
(audio decode+stats; langid+perplexity which share one text-encode
pass). All other features are Catalyst expressions compiled into
whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from bdqc_spark.functions import text as T
from bdqc_spark.functions.audio import profile_batch

# Explicit StructTypes (not DDL strings): lets the UDFs be constructed
# without an active SparkContext (workers import this module too).
AUDIO_PROFILE_TYPE = StructType(
    [
        StructField("pcm_ok", BooleanType()),
        StructField("n_samples", IntegerType()),
        StructField("dur_ms_decoded", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("clip_rate", DoubleType()),
        StructField("dc_off", DoubleType()),
    ]
)

LANG_TYPE = StructType(
    [
        StructField("pred", StringType()),
        StructField("conf", DoubleType()),
        StructField("ppl", DoubleType()),
    ]
)


@pandas_udf(AUDIO_PROFILE_TYPE)
def _audio_profile_udf(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
    return profile_batch(raw, codec, sr_hz)


@pandas_udf(LANG_TYPE)
def _lang_udf(transcript: pd.Series) -> pd.DataFrame:
    # Imports inside the UDF body run on the worker; models are
    # lru_cached per worker process (trained deterministically once).
    from bdqc_spark.functions.langid import predict_batch
    from bdqc_spark.functions.lm import perplexity_batch

    out = predict_batch(transcript)
    out["ppl"] = perplexity_batch(transcript)
    return out


def profile_clips(clips: DataFrame) -> DataFrame:
    """clips(clip_id, bytes, sr_hz, dur_ms, codec, transcript [,bucket])
    → profiles(clip_id, sr_hz, dur_ms, codec, transcript [,bucket],
               audio struct, text struct, lang struct)
    """
    keep = [c for c in clips.columns if c != "bytes"]
    return clips.select(
        *keep,
        _audio_profile_udf(F.col("bytes"), F.col("codec"), F.col("sr_hz")).alias("audio"),
        T.profile_struct(F.col("transcript")).alias("text"),
        _lang_udf(F.col("transcript")).alias("lang"),
    )
