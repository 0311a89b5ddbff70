"""Audio augmentation (functions/augment.py): speed perturbation
scales duration and pitch together; noise mixing hits the target SNR
deterministically; corrupt rows degrade; output composes with the
profile stage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdqc_spark.functions.augment import (
    augment_noise,
    augment_speed,
    mix_noise,
    speed_perturb,
)


def _tone(freq: float, sr: int, sec: float = 1.0, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x.astype(np.float64)))
    return float(np.argmax(spec) * sr / len(x))


def test_speed_perturb_scales_duration_and_pitch():
    sr = 16000
    x = _tone(440.0, sr)
    for factor in (0.9, 1.1):
        y = speed_perturb(x, sr, factor)
        assert abs(len(y) - len(x) / factor) <= 2
        # pitch moves WITH speed (Ko et al. "speed", not tempo-only)
        assert abs(_peak_freq(y, sr) - 440.0 * factor) < 5.0
    assert speed_perturb(x, sr, 1.0) is x  # identity fast path


def test_speed_perturb_rejects_bad_factor():
    with pytest.raises(ValueError):
        speed_perturb(_tone(440, 16000), 16000, 0.0)


def test_mix_noise_hits_target_snr():
    x = _tone(300.0, 16000, sec=2.0)
    for snr in (10.0, 20.0, 30.0):
        y = mix_noise(x, snr, np.random.default_rng(1))
        noise = y.astype(np.float64) - x.astype(np.float64)
        got = 20 * np.log10(np.std(x) / np.std(noise))
        assert abs(got - snr) < 0.5, (snr, got)
    silent = np.zeros(1000, dtype=np.float32)
    assert np.array_equal(mix_noise(silent, 20.0, np.random.default_rng(1)), silent)


@pytest.fixture(scope="module")
def clips(spark):
    from bdqc_spark.synth.clips import generate_clips_df

    return generate_clips_df(spark, 120, seed=47, include_labels=True).cache()


def test_augment_speed_spark_end_to_end(spark, clips):
    out = augment_speed(clips, factor=1.1).cache()
    try:
        pdf = out.drop("bytes").toPandas()
        orig = clips.select("clip_id", "anomaly", F.col("dur_ms").alias("dur0")).toPandas()
        m = pdf.merge(orig[["clip_id", "dur0"]], on="clip_id")
        corrupt = set(orig[orig.anomaly == "A"].clip_id)
        bad = m[m.clip_id.isin(corrupt)]
        assert not bad.augment_ok.any()
        good = m[~m.clip_id.isin(corrupt)]
        assert good.augment_ok.all()
        assert (good.codec == "pcm_s16le").all()
        # duration compresses by ~1/1.1; dur0 may lie (class D) so
        # compare against the DECODED sample count instead: n_samples
        # is internally consistent with dur_ms at the (unchanged) rate
        secs = good.n_samples / good.sr_hz
        assert np.allclose(secs * 1000, good.dur_ms, atol=1.0)
        from bdqc_spark.plans.profile import profile_clips

        prof = (
            profile_clips(out.drop("augment_ok", "n_samples"))
            .select("clip_id", "audio.pcm_ok")
            .toPandas()
        )
        mm = prof.merge(pdf[["clip_id", "augment_ok"]], on="clip_id")
        assert (mm.pcm_ok == mm.augment_ok).all()
    finally:
        out.unpersist()


def test_augment_noise_spark_deterministic_and_snr(spark, clips):
    a = augment_noise(clips, snr_db=20.0, seed=5).select("clip_id", "bytes").toPandas()
    b = (
        augment_noise(clips.repartition(7), snr_db=20.0, seed=5)
        .select("clip_id", "bytes")
        .toPandas()
    )
    m = a.merge(b, on="clip_id", suffixes=("_a", "_b"))
    assert len(m) == 120
    same = [
        (x is None and y is None) or (x is not None and bytes(x) == bytes(y))
        for x, y in zip(m.bytes_a, m.bytes_b)
    ]
    assert all(same)  # partitioning cannot change the augmented corpus
    c = augment_noise(clips, snr_db=20.0, seed=6).select("clip_id", "bytes").toPandas()
    m2 = a.merge(c, on="clip_id", suffixes=("_a", "_c"))
    diff = [
        x is not None and y is not None and bytes(x) != bytes(y)
        for x, y in zip(m2.bytes_a, m2.bytes_c)
    ]
    assert any(diff)  # a different seed re-deals the noise


def test_augment_noise_measured_snr_on_clip(spark, clips):
    from bdqc_spark.functions.audio import decode

    row = (
        clips.where((F.col("anomaly") == "") & (F.col("codec") == "pcm_s16le"))
        .orderBy("clip_id")
        .limit(1)
        .collect()[0]
    )
    one = spark.createDataFrame([row], clips.schema)
    aug = augment_noise(one, snr_db=15.0, seed=3).collect()[0]
    x = decode(bytes(row.bytes), "pcm_s16le").astype(np.float64)
    y = decode(bytes(aug.bytes), "pcm_s16le").astype(np.float64)
    noise = y - x
    got = 20 * np.log10(np.std(x) / np.std(noise))
    # int16 re-quantization adds ~-50 dB; at 15 dB target it is noise
    # on the noise — allow 1 dB
    assert abs(got - 15.0) < 1.0, got


# -- property-based (hypothesis) -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    factor=st.floats(min_value=0.5, max_value=2.0),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_speed_perturb_length_property(n, factor, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = speed_perturb(x, 16000, factor)
    want = max(int(round(n * 16000 / max(int(round(16000 * factor)), 1))), 1)
    assert len(y) == want
    assert y.dtype == np.float32
    # the anti-alias FIR legitimately overshoots ±1 on full-range
    # noise (Gibbs ringing, bounded by the kernel's ℓ1 norm); the
    # wire encode step clips to [-1, 1] (functions/audio.encode)
    assert np.isfinite(y).all()
    assert np.all(np.abs(y) <= 1.5)


@settings(max_examples=25, deadline=None)
@given(
    snr=st.floats(min_value=0.0, max_value=60.0),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_mix_noise_bounded_and_deterministic(snr, seed):
    rng = np.random.default_rng(3)
    x = (0.5 * np.sin(np.arange(8000) * 0.1)).astype(np.float32)
    a = mix_noise(x, snr, np.random.default_rng(seed))
    b = mix_noise(x, snr, np.random.default_rng(seed))
    assert np.array_equal(a, b)  # pure function of (signal, snr, rng state)
    assert np.all(a <= 1.0) and np.all(a >= -1.0)


def test_time_stretch_scales_duration_preserves_pitch():
    from bdqc_spark.functions.augment import time_stretch
    from bdqc_spark.functions.pitch import pitch_stats

    sr = 16000
    x = _tone(220.0, sr, sec=3.0)
    for rate in (0.8, 1.25):
        y = time_stretch(x, sr, rate)
        # duration scales by 1/rate (within the framing slack)
        assert abs(len(y) - len(x) / rate) <= int(sr * 0.05)
        # pitch does NOT move (ACF lag quantization allows ±4 Hz);
        # speed_perturb at the same factor shifts it by 220·(rate−1)
        f0 = pitch_stats(y, sr)["f0_median_hz"]
        assert abs(f0 - 220.0) < 4.0, (rate, f0)
        f0_speed = pitch_stats(speed_perturb(x, sr, rate), sr)["f0_median_hz"]
        assert abs(f0_speed - 220.0 * rate) < 8.0
        # energy preserved through COLA normalization
        assert abs(float(np.std(y)) / float(np.std(x)) - 1.0) < 0.05


def test_time_stretch_identity_determinism_and_edges():
    from bdqc_spark.functions.augment import time_stretch

    sr = 16000
    x = _tone(300.0, sr, sec=1.0)
    assert np.array_equal(time_stretch(x, sr, 1.0), x)
    a = time_stretch(x, sr, 1.1)
    b = time_stretch(x, sr, 1.1)
    assert np.array_equal(a, b)
    short = _tone(300.0, sr, sec=0.02)  # < two frames: passthrough
    assert np.array_equal(time_stretch(short, sr, 1.3), short)
    with pytest.raises(ValueError):
        time_stretch(x, sr, 0.0)


def test_augment_tempo_spark_end_to_end(spark, clips):
    from bdqc_spark.functions.augment import augment_tempo

    out = augment_tempo(clips, rate=1.25).cache()
    try:
        pdf = out.drop("bytes").toPandas()
        orig = clips.select("clip_id", "anomaly").toPandas()
        corrupt = set(orig[orig.anomaly == "A"].clip_id)
        bad = pdf[pdf.clip_id.isin(corrupt)]
        assert not bad.augment_ok.any()
        good = pdf[~pdf.clip_id.isin(corrupt)]
        assert good.augment_ok.all()
        assert (good.codec == "pcm_s16le").all()
        secs = good.n_samples / good.sr_hz
        assert np.allclose(secs * 1000, good.dur_ms, atol=1.0)
    finally:
        out.unpersist()
