"""SNR estimator (functions/snr.py): known-SNR synthesis recovered
within tolerance, edge conventions hold, Spark operator matches the
single-node function and degrades on malformed rows."""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions.snr import SNR_CAP_DB, clip_snr, snr_stats

SR = 16000


def _speech_like(snr_db: float, seed: int = 0, noise_rms: float = 0.01):
    """Alternating 300 ms 'speech' (tone+noise) / 300 ms pause (noise
    only), 3 s total. True SNR = tone power / noise power."""
    rng = np.random.default_rng(seed)
    sig_rms = noise_rms * 10 ** (snr_db / 20)
    amp = sig_rms * np.sqrt(2)
    t = np.arange(3 * SR) / SR
    tone = amp * np.sin(2 * np.pi * 440 * t)
    gate = (t % 0.6) < 0.3
    x = tone * gate + rng.normal(0, noise_rms, t.shape)
    return np.clip(x, -1, 1).astype(np.float32)


@pytest.mark.parametrize("true_snr", [10.0, 20.0, 30.0])
def test_known_snr_recovered(true_snr):
    st = snr_stats(_speech_like(true_snr), SR)
    assert st is not None
    assert abs(st["snr_db"] - true_snr) < 2.0, st
    assert 0.3 < st["active_frac"] < 0.7


def test_edge_conventions():
    # shorter than one 20 ms frame -> no estimate
    assert snr_stats(np.zeros(10, np.float32), SR) is None
    assert snr_stats(np.zeros(0, np.float32), SR) is None
    # all-noise clip (below the VAD gate) -> 0 dB, active_frac 0
    rng = np.random.default_rng(1)
    st = snr_stats(rng.normal(0, 0.005, SR).astype(np.float32), SR)
    assert st["snr_db"] == 0.0 and st["active_frac"] == 0.0
    # digitally silent pauses -> capped
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * ((t % 0.6) < 0.3)).astype(np.float32)
    assert snr_stats(x, SR)["snr_db"] == SNR_CAP_DB
    # wall-to-wall tone: noise proxied by the quietest frame ->
    # finite, and a LOWER bound (conservative for keep/drop)
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    st = snr_stats(y, SR)
    assert st["active_frac"] == 1.0 and 0.0 <= st["snr_db"] < SNR_CAP_DB


def test_noise_floor_reported_in_dbfs():
    noise_rms = 0.02 * 10 ** (-0.25)  # just under the VAD gate
    rng = np.random.default_rng(2)
    st = snr_stats(rng.normal(0, noise_rms, 2 * SR).astype(np.float32), SR)
    assert abs(st["noise_dbfs"] - 20 * np.log10(noise_rms)) < 1.0


def test_clip_snr_spark(spark):
    from bdqc_spark.functions.audio import encode

    good = _speech_like(20.0, seed=3)
    rows = [
        ("a", encode(good, "pcm_s16le"), SR, 3000, "pcm_s16le", "x"),
        ("b", encode(good, "flac"), SR, 3000, "flac", "x"),
        ("c", b"\x01", SR, 3000, "pcm_s16le", "x"),
        ("d", None, SR, 3000, "wav", "x"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )
    got = {r.clip_id: r for r in clip_snr(df).collect()}
    assert got["a"].snr_ok and got["b"].snr_ok
    assert not got["c"].snr_ok and not got["d"].snr_ok
    # quantization noise of the s16 wire format is ~-90 dBFS, far
    # below the -40 dBFS synthetic floor: estimates must agree with
    # the float single-node twin to a fraction of a dB
    ref = snr_stats(good, SR)["snr_db"]
    assert abs(got["a"].snr_db - ref) < 0.2
    assert abs(got["b"].snr_db - ref) < 0.2
    assert "bytes" not in clip_snr(df).columns
