"""Cue↔VAD alignment QC (functions/cue_align.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.cue_align import cue_alignment, cue_alignment_stats
from bdqc_spark.functions.subtitles import build_srt, build_vtt

SR = 16000


def _speech_pcm(bursts_ms, total_ms=5000, amp=0.3, seed=5):
    """Zeros with noise bursts over the given [start,end) ms windows."""
    rng = np.random.default_rng(seed)
    pcm = np.zeros(int(SR * total_ms / 1000), dtype=np.float32)
    for s, e in bursts_ms:
        sl = slice(int(SR * s / 1000), int(SR * e / 1000))
        pcm[sl] = (amp * rng.standard_normal(sl.stop - sl.start)).astype(np.float32)
    return pcm


BURSTS = [(500, 1500), (2200, 3400)]
CUES = [
    {"start_ms": 500, "end_ms": 1500, "text": "first"},
    {"start_ms": 2200, "end_ms": 3400, "text": "second"},
]


def test_matched_cues_score_high():
    st = cue_alignment_stats(_speech_pcm(BURSTS), SR, build_srt(CUES))
    assert st["n_cues"] == 2
    assert st["cue_precision"] >= 0.9 and st["cue_recall"] >= 0.9
    assert abs(st["offset_ms"]) <= 40
    # aligned metrics can't be worse than raw
    assert st["cue_precision_aligned"] >= st["cue_precision"] - 1e-9


def test_constant_offset_recovered():
    late = [dict(c, start_ms=c["start_ms"] + 400, end_ms=c["end_ms"] + 400) for c in CUES]
    st = cue_alignment_stats(_speech_pcm(BURSTS), SR, build_vtt(late))
    assert st["cue_recall"] < 0.8  # raw misses a chunk of the speech
    assert st["offset_ms"] == pytest.approx(400, abs=40)
    assert st["cue_recall_aligned"] >= 0.9 and st["cue_precision_aligned"] >= 0.9


def test_negative_offset_sign_convention():
    early = [dict(c, start_ms=c["start_ms"] - 300, end_ms=c["end_ms"] - 300) for c in CUES]
    st = cue_alignment_stats(_speech_pcm(BURSTS), SR, build_srt(early))
    assert st["offset_ms"] == pytest.approx(-300, abs=40)
    assert st["cue_recall_aligned"] >= 0.9


def test_wrong_transcript_scores_low_everywhere():
    # cues over the silent region only
    bad = [{"start_ms": 3600, "end_ms": 4800, "text": "nothing here"}]
    st = cue_alignment_stats(_speech_pcm(BURSTS), SR, build_srt(bad))
    assert st["cue_precision"] < 0.3
    # even the best shift can't cover BOTH bursts with one short cue
    assert st["cue_recall_aligned"] < 0.7


def test_unparseable_and_degenerate_inputs():
    assert cue_alignment_stats(_speech_pcm(BURSTS), SR, "not a cue file") is None
    assert cue_alignment_stats(np.zeros(0, np.float32), SR, build_srt(CUES)) is None


def test_spark_pass(spark):
    from bdqc_spark.functions.audio import encode

    pcm = _speech_pcm(BURSTS)
    late = [dict(c, start_ms=c["start_ms"] + 400, end_ms=c["end_ms"] + 400) for c in CUES]
    rows = [
        ("good", encode(pcm, "pcm_s16le", SR), "pcm_s16le", SR, build_srt(CUES)),
        ("late", encode(pcm, "pcm_s16le", SR), "pcm_s16le", SR, build_srt(late)),
        ("nocue", encode(pcm, "pcm_s16le", SR), "pcm_s16le", SR, "garbage"),
        ("badaudio", b"\x00\x01", "flac", SR, build_srt(CUES)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "sr_hz", "subtitle"])
    )
    out = cue_alignment(df).toPandas().set_index("clip_id")
    assert bool(out.loc["good", "align_ok"]) and out.loc["good", "cue_recall"] >= 0.9
    assert abs(out.loc["good", "offset_ms"]) <= 40
    assert out.loc["late", "offset_ms"] == pytest.approx(400, abs=40)
    assert out.loc["late", "cue_recall_aligned"] >= 0.9
    assert not bool(out.loc["nocue", "align_ok"])
    assert not bool(out.loc["badaudio", "align_ok"])
    assert "bytes" not in out.columns and "subtitle" not in out.columns
