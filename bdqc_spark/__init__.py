"""bdqc_spark — a PySpark-native quality-filter analytics engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference ``ini-bdds/bdqc`` (profile → model →
flag-outliers), re-targeted as a language-ID + quality-filter +
PII/toxicity-scrub pipeline over Iceberg-shaped tables of audio
clip + transcript pairs (see SURVEY.md).

Layout
------
- ``session``    SparkSession factory (Arrow + AQE tuned)
- ``sources``    parquet / Iceberg-shaped adapter / sinks
- ``functions``  scalar+vectorized function library (audio codecs,
                 langid, perplexity LM, scrub chain, text stats)
- ``operators``  relational operator compositions (robust stats,
                 salted joins, dedup, similarity search, top-k)
- ``plans``      the pipeline stages (profile → models → decide)
                 + rule compiler + checkpoint/resume protocol
- ``synth``      deterministic clips generator + single-node oracle
- ``streaming``  Structured Streaming wrappers
"""

__version__ = "0.1.0"
