"""F0 estimation (functions/pitch.py) — no SQL twin for an FFT, so
semantics are gated here: known-frequency recovery on tones and
harmonic-rich waveforms, noise/silence rejection, chirp spread, and
Spark↔numpy parity through the wire format."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bdqc_spark.functions.pitch import clip_pitch, pitch_stats

SR = 16000


def _encode(pcm: np.ndarray) -> bytes:
    q = np.clip(np.round(np.asarray(pcm, dtype=np.float64) * 32767.0), -32768, 32767)
    return q.astype("<i2").tobytes()


def _decode(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / np.float32(32767.0)


def _tone(f0: float, secs: float = 1.0, amp: float = 0.3) -> np.ndarray:
    t = np.arange(int(SR * secs)) / SR
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_pure_tone_recovered():
    for f0 in (100.0, 220.0, 330.0):
        st = pitch_stats(_tone(f0), SR)
        # integer-lag resolution: sr/round(sr/f0) — coarser as f0 rises
        tol = f0 * f0 / SR + 1.0
        assert st["f0_median_hz"] == pytest.approx(f0, abs=tol), (f0, st)
        assert st["voiced_frac"] >= 0.95
        assert st["f0_iqr_hz"] <= tol


def test_harmonic_rich_sawtooth_fundamental():
    """A sawtooth has all harmonics — the ACF must still lock to the
    100 Hz fundamental, not an overtone."""
    t = np.arange(SR) / SR
    saw = (0.3 * (2.0 * ((t * 100.0) % 1.0) - 1.0)).astype(np.float32)
    st = pitch_stats(saw, SR)
    assert st["f0_median_hz"] == pytest.approx(100.0, abs=2.0), st
    assert st["voiced_frac"] >= 0.95


def test_noise_unvoiced():
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    st = pitch_stats(x, SR)
    assert st["voiced_frac"] <= 0.1, st
    # near-silence and pure silence: no voiced frames at all
    st2 = pitch_stats(np.zeros(SR, dtype=np.float32), SR)
    assert st2["voiced_frac"] == 0.0
    assert st2["f0_median_hz"] is None and st2["f0_iqr_hz"] is None


def test_chirp_median_inside_sweep_with_spread():
    t = np.arange(SR) / SR
    # linear sweep 150 → 300 Hz over 1 s: phase = 2π(150t + 75t²)
    x = (0.3 * np.sin(2 * np.pi * (150.0 * t + 75.0 * t * t))).astype(np.float32)
    st = pitch_stats(x, SR)
    assert 150.0 <= st["f0_median_hz"] <= 300.0
    assert st["f0_iqr_hz"] > 10.0  # a sweep is not a steady tone
    assert st["voiced_frac"] >= 0.9


def test_too_short_returns_none():
    assert pitch_stats(np.zeros(100, dtype=np.float32), SR) is None
    assert pitch_stats(np.zeros(0, dtype=np.float32), SR) is None


_SCHEMA = StructType(
    [
        StructField("clip_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("codec", StringType()),
        StructField("sr_hz", IntegerType()),
    ]
)


def test_spark_numpy_twin_parity(spark):
    rng = np.random.default_rng(1)
    clips = [
        (0, _encode(_tone(220.0)), "pcm_s16le", SR),
        (1, _encode((0.1 * rng.standard_normal(SR)).astype(np.float32)), "pcm_s16le", SR),
        (2, None, "pcm_s16le", SR),
        (3, _encode(_tone(150.0, secs=0.005)), "pcm_s16le", SR),  # too short
    ]
    df = spark.createDataFrame(clips, _SCHEMA)
    out = {r["clip_id"]: r for r in clip_pitch(df).collect()}
    for cid, raw, codec, sr in clips:
        r = out[cid]
        if raw is None or len(raw) < 2 * int(SR * 0.04):
            assert not r["pitch_ok"]
            continue
        st = pitch_stats(_decode(raw), sr)
        assert r["pitch_ok"]
        assert r["voiced_frac"] == pytest.approx(st["voiced_frac"], abs=1e-12)
        assert r["n_frames"] == st["n_frames"]
        if st["f0_median_hz"] is None:
            assert r["f0_median_hz"] != r["f0_median_hz"]  # NaN convention
        else:
            assert r["f0_median_hz"] == pytest.approx(st["f0_median_hz"], abs=1e-9)
            assert r["f0_iqr_hz"] == pytest.approx(st["f0_iqr_hz"], abs=1e-9)
