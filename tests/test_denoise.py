"""Spectral-gating denoiser (functions/denoise.py) — no SQL twin for
an STFT, so semantics are gated here: measured SNR improvement on
noisy speech-like clips, near-exact passthrough on clean clips
(noise profile ≈ 0 → unit gain), numpy-twin parity through the Spark
plan, determinism, and the too-short / null / silence edge contracts.
"""

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

from bdqc_spark.functions.denoise import clip_denoise, denoise_pcm

SR = 16000


def _bursts(seed: int = 0, amp: float = 0.3, noise_std: float = 0.015,
            secs: float = 2.0) -> np.ndarray:
    """Speech-like test clip: 440 Hz tone bursts with real pauses
    (200 ms on / 200 ms off), plus stationary white noise. noise_std
    is chosen below VAD_RMS_MIN (0.02) so pause frames stay INACTIVE
    for snr_stats on the noisy input."""
    rng = np.random.default_rng(seed)
    n = int(SR * secs)
    t = np.arange(n) / SR
    gate = (np.floor(t / 0.2).astype(int) % 2) == 0
    x = amp * np.sin(2 * np.pi * 440.0 * t) * gate
    if noise_std > 0:
        x = x + noise_std * rng.standard_normal(n)
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def _encode(pcm: np.ndarray) -> bytes:
    q = np.clip(np.round(pcm.astype(np.float64) * 32767.0), -32768, 32767)
    return q.astype("<i2").tobytes()


def _decode(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / np.float32(32767.0)


def test_noisy_clip_snr_improves():
    from bdqc_spark.functions.snr import snr_stats

    noisy = _decode(_encode(_bursts()))  # through the wire format
    y, st = denoise_pcm(noisy, SR)
    assert st["noise_reduction_db"] >= 8.0, st
    b = snr_stats(noisy, SR)
    a = snr_stats(y, SR)
    assert a["snr_db"] >= b["snr_db"] + 5.0, (b, a)
    # the speech itself survives: active fraction unchanged within a frame
    assert abs(a["active_frac"] - b["active_frac"]) <= 0.05


def test_clean_clip_passthrough():
    """Digital-silence pauses → noise profile exactly 0 → unit gain →
    the OLA reconstruction returns the input (float64 rounding only)."""
    clean = _bursts(noise_std=0.0)
    y, st = denoise_pcm(clean, SR)
    assert np.max(np.abs(y.astype(np.float64) - clean.astype(np.float64))) < 1e-6
    assert abs(st["noise_reduction_db"]) < 1e-6


def test_silence_stays_silent():
    z = np.zeros(SR, dtype=np.float32)
    y, st = denoise_pcm(z, SR)
    assert np.max(np.abs(y)) == 0.0
    assert st["noise_reduction_db"] == pytest.approx(0.0, abs=1e-9)


def test_too_short_returns_none():
    assert denoise_pcm(np.zeros(100, dtype=np.float32), SR) is None
    assert denoise_pcm(np.zeros(0, dtype=np.float32), SR) is None


def test_deterministic():
    noisy = _bursts(seed=3)
    y1, s1 = denoise_pcm(noisy, SR)
    y2, s2 = denoise_pcm(noisy, SR)
    assert np.array_equal(y1, y2)
    assert s1 == s2


_SCHEMA = StructType(
    [
        StructField("clip_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("codec", StringType()),
        StructField("sr_hz", IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def spark_rows(spark):
    clips = [
        (0, _encode(_bursts(seed=0)), "pcm_s16le", SR),
        (1, _encode(_bursts(seed=1, noise_std=0.0)), "pcm_s16le", SR),
        (2, b"\x00\x00" * 100, "pcm_s16le", SR),  # too short → passthrough
        (3, None, "pcm_s16le", SR),  # null payload
        (4, _encode(_bursts(seed=4)), "opus", SR),  # unknown codec
    ]
    df = spark.createDataFrame(clips, _SCHEMA)
    out = {r["clip_id"]: r for r in clip_denoise(df).collect()}
    out_b = {r["clip_id"]: r for r in clip_denoise(df, emit_bytes=True).collect()}
    return clips, out, out_b


def test_spark_numpy_twin_parity(spark_rows):
    clips, out, _ = spark_rows
    for cid, raw, codec, sr in clips:
        r = out[cid]
        if raw is None or codec != "pcm_s16le" or len(raw) < 2 * 2 * 512:
            assert not r["denoise_ok"]
            # repo convention (same as clips_snr): skipped rows carry
            # NaN signal columns gated by the ok flag
            assert r["noise_reduction_db"] != r["noise_reduction_db"]
            continue
        res = denoise_pcm(_decode(raw), sr)
        assert r["denoise_ok"]
        _, st = res
        assert r["noise_dbfs_before"] == pytest.approx(st["noise_dbfs_before"], abs=1e-9)
        assert r["noise_dbfs_after"] == pytest.approx(st["noise_dbfs_after"], abs=1e-9)
        assert r["noise_reduction_db"] == pytest.approx(st["noise_reduction_db"], abs=1e-9)


def test_spark_emit_bytes_roundtrip(spark_rows):
    clips, _, out_b = spark_rows
    raw = dict((c[0], c[1]) for c in clips)[0]
    y, _ = denoise_pcm(_decode(raw), SR)
    got = out_b[0]["denoised_bytes"]
    q = np.clip(np.round(y.astype(np.float64) * 32767.0), -32768, 32767).astype("<i2")
    assert got == q.tobytes()
    assert len(got) == len(raw)
    # rows the denoiser skips carry no payload
    assert out_b[2]["denoised_bytes"] is None
    assert out_b[3]["denoised_bytes"] is None


def test_spark_snr_columns_consistent(spark_rows):
    _, out, _ = spark_rows
    r = out[0]
    assert r["snr_db_after"] >= r["snr_db_before"] + 5.0
