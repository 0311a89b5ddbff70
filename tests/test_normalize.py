"""Loudness normalization + silence trimming (functions/normalize.py):
gain lands on the target LUFS, the peak ceiling is never violated,
trim recovers planted silence paddings using the profile stage's own
VAD convention, and both Spark passes degrade on corrupt rows."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdqc_spark.functions.loudness import integrated_lufs
from bdqc_spark.functions.normalize import (
    PEAK_CEIL_DBFS,
    clip_normalize,
    clip_trim_silence,
    normalize_gain,
    trim_silence,
)


def _tone(freq: float, sr: int, sec: float = 1.0, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# --------------------------------------------------------------------------
# normalize_gain
# --------------------------------------------------------------------------
def test_gain_lands_on_target():
    sr = 16000
    for amp, target in ((0.05, -23.0), (0.4, -23.0), (0.1, -16.0)):
        x = _tone(440.0, sr, sec=1.5, amp=amp)
        y, lufs0, gain_db, limited = normalize_gain(x, sr, target)
        assert lufs0 == pytest.approx(integrated_lufs(x, sr))
        if not limited:
            assert integrated_lufs(y, sr) == pytest.approx(target, abs=0.1)
            assert gain_db == pytest.approx(target - lufs0, abs=1e-9)


def test_peak_ceiling_guard():
    sr = 16000
    # quiet on average but with a full-scale transient: the loudness
    # gain would clip, so the limiter must cap at the ceiling instead
    x = _tone(300.0, sr, sec=1.5, amp=0.02)
    x[1000] = 0.99
    y, lufs0, gain_db, limited = normalize_gain(x, sr, -16.0)
    assert limited
    ceil = 10.0 ** (PEAK_CEIL_DBFS / 20.0)
    peak = float(np.max(np.abs(y)))
    assert peak == pytest.approx(ceil, rel=1e-6)
    assert gain_db < (-16.0 - lufs0)
    # pure linear gain: waveform shape preserved up to the scalar
    assert np.allclose(y, x * (peak / 0.99), atol=1e-6)


def test_silence_passthrough():
    sr = 16000
    x = np.zeros(sr, dtype=np.float32)
    y, lufs0, gain_db, limited = normalize_gain(x, sr)
    assert lufs0 == float("-inf") and gain_db == 0.0 and not limited
    assert np.array_equal(y, x)


# --------------------------------------------------------------------------
# trim_silence
# --------------------------------------------------------------------------
def test_trim_recovers_planted_paddings():
    sr = 16000
    lead_ms, trail_ms, pad_ms = 500, 300, 100
    speech = _tone(220.0, sr, sec=1.0, amp=0.3)
    x = np.concatenate(
        [
            np.zeros(sr * lead_ms // 1000, np.float32),
            speech,
            np.zeros(sr * trail_ms // 1000, np.float32),
        ]
    )
    y, lead, trail = trim_silence(x, sr, pad_ms=pad_ms)
    # trims everything but pad_ms of context (± one 20 ms VAD frame)
    assert abs(lead - (lead_ms - pad_ms)) <= 20
    assert abs(trail - (trail_ms - pad_ms)) <= 20
    n_kept = len(y)
    expect = len(speech) + 2 * (sr * pad_ms // 1000)
    assert abs(n_kept - expect) <= 2 * sr * 20 // 1000
    # the kept slice is an EXACT slice of the input (no resynthesis)
    start = sr * lead // 1000
    assert np.array_equal(y, x[start : start + n_kept])


def test_trim_all_silence_and_short_clip():
    sr = 16000
    silent = np.zeros(sr, dtype=np.float32)
    y, lead, trail = trim_silence(silent, sr)
    assert len(y) == 0 and lead == 1000 and trail == 0
    tiny = _tone(440.0, sr, sec=0.001)  # shorter than one VAD frame
    y2, lead2, trail2 = trim_silence(tiny, sr)
    assert np.array_equal(y2, tiny) and lead2 == 0 and trail2 == 0


def test_trim_no_silence_noop():
    sr = 16000
    x = _tone(220.0, sr, sec=1.0, amp=0.3)
    y, lead, trail = trim_silence(x, sr, pad_ms=100)
    assert lead == 0 and trail == 0
    assert np.array_equal(y, x)


# --------------------------------------------------------------------------
# Spark passes
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def clips(spark):
    from bdqc_spark.synth.clips import generate_clips_df

    return generate_clips_df(spark, 120, seed=48, include_labels=True).cache()


def test_clip_normalize_spark(spark, clips):
    from bdqc_spark.functions.audio import decode

    out = clip_normalize(clips, target_lufs=-20.0).cache()
    try:
        m = out.toPandas()  # anomaly passes through the rewrite
        corrupt = m[m.anomaly == "A"]
        assert not corrupt.norm_ok.any()
        assert corrupt.bytes.isna().all()
        good = m[m.norm_ok]
        assert len(good) > 90
        assert (good.codec == "pcm_s16le").all()
        # re-measure a few rewritten payloads end-to-end
        ceil = 10.0 ** (PEAK_CEIL_DBFS / 20.0)
        checked = 0
        for _, r in good.head(12).iterrows():
            pcm = decode(bytes(r["bytes"]), "pcm_s16le")
            assert float(np.max(np.abs(pcm), initial=0.0)) <= ceil + 1e-3
            if not r["limited"] and np.isfinite(r["lufs_after"]):
                got = integrated_lufs(pcm, int(r["sr_hz"]))
                assert got == pytest.approx(-20.0, abs=0.3)
                checked += 1
        assert checked > 0
    finally:
        out.unpersist()


def test_clip_trim_spark_composes_with_profile(spark, clips):
    out = clip_trim_silence(clips, pad_ms=100).cache()
    try:
        m = out.drop("bytes").toPandas()  # anomaly passes through
        assert not m[m.anomaly == "A"].trim_ok.any()
        good = m[m.trim_ok]
        assert len(good) > 90
        assert (good.dur_ms_after >= 0).all()
        assert (good.lead_trim_ms >= 0).all() and (good.trail_trim_ms >= 0).all()
        # the rewritten corpus must flow straight back into the profiler
        from bdqc_spark.plans.profile import profile_clips

        keep = out.filter(F.col("trim_ok") & (F.col("dur_ms_after") > 0)).drop(
            "trim_ok", "lead_trim_ms", "trail_trim_ms"
        )
        prof = profile_clips(keep.withColumnRenamed("dur_ms_after", "dur_ms"))
        got = prof.select("clip_id", "audio.pcm_ok").toPandas()
        assert got.pcm_ok.all()
    finally:
        out.unpersist()
