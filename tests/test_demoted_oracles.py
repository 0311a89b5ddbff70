"""Oracle checks for registry entries demoted past the driver's
50-row recording window (__spark_entry__.queries() order is evidence
policy — see the registry comment). The driver no longer records
these, so this test keeps them continuously verified against the
same DuckDB oracle at sf0.001 (cheap single-builtin queries).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from bdqc_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SF_DIR_SMOKE", "/root/testdata/sf0.001")

# r4 rotation (r3 ADVICE #4): string_funcs + conditional moved back
# inside the driver's recording window so external evidence keeps
# sampling cheap oracle-backed scalar-function queries; window_rank +
# cube_metrics (each redundant with an in-window sibling —
# topk_per_group / rollup_metrics) took their demoted slots.
DEMOTED_ORACLE_QUERIES = [
    "window_rank",
    "cube_metrics",
    "datetime_funcs",
    "math_funcs",
    "split_explode",
    "doc_length_drift",
    "doc_repetition",
    # r4 additions land past the window by registry order (the first
    # 50 slots are pinned to the flagship + oracle mix the driver
    # records); they get the same continuous in-suite oracle check
    "doc_train_split",
    "doc_stratified_sample",
    "doc_pack_bins",
    "doc_decontaminate",
    "doc_top_terms",
    "emb_decontaminate",
    "corpus_report",
    "doc_quality_buckets",
    "doc_bigram_ppl",
    "doc_dedup_weights",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_demoted_set_matches_registry():
    """Every oracle-backed query past position 50 must be in the
    demoted list above (no silently unevidenced oracle queries)."""
    qs = list(entry.queries())
    oracles = entry.oracle_sql()
    past_window = [q for q in qs[50:] if q in oracles]
    assert sorted(past_window) == sorted(DEMOTED_ORACLE_QUERIES)


def test_flagships_inside_recording_window():
    """The north-star queries must stay inside the driver's 50-row
    recording window (regression guard for the r1/r2 evidence gap)."""
    win = list(entry.queries())[:50]
    for name in [
        "clips_pipeline_decisions",
        "clips_audio_profile",
        "clips_explain",
        "doc_langid",
        "minhash_lsh_pairs",
        "ann_lsh_topk",
    ]:
        assert name in win, f"{name} fell past the driver recording window"
    assert len(win) == 50


@pytest.mark.parametrize("name", DEMOTED_ORACLE_QUERIES)
def test_demoted_query_matches_oracle(spark, duck, name):
    from tools.check_oracle import canon

    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(entry.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(ddf)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    a, b = canon(sdf), canon(ddf)
    assert a.equals(b), f"{name}: values differ vs oracle"
