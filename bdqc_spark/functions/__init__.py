from bdqc_spark.functions import audio, langid, lm, scrub, text

__all__ = ["audio", "langid", "lm", "scrub", "text"]
