"""Ring-1 tests for BS.1770-style integrated loudness.

Anchors are the public ones: the derived 48 kHz biquad coefficients
must reproduce the table printed in ITU-R BS.1770 itself, and a
full-scale 997 Hz sine must read −3.01 LUFS (the spec's stated
calibration point)."""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions.loudness import (
    clip_loudness,
    integrated_lufs,
    k_filter_coeffs,
    loudness_stats,
)

# coefficient table printed in BS.1770 (48 kHz)
PUB_B1 = [1.53512485958697, -2.69169618940638, 1.19839281085285]
PUB_A1 = [1.0, -1.69065929318241, 0.73248077421585]
PUB_B2 = [1.0, -2.0, 1.0]
PUB_A2 = [1.0, -1.99004745483398, 0.99007225036621]


def test_derived_coeffs_match_itu_table():
    b1, a1, b2, a2 = k_filter_coeffs(48000)
    assert np.abs(b1 - PUB_B1).max() < 1e-10
    assert np.abs(a1 - PUB_A1).max() < 1e-10
    assert np.abs(b2 - PUB_B2).max() < 1e-10
    assert np.abs(a2 - PUB_A2).max() < 1e-10


@pytest.mark.parametrize("sr", [48000, 44100, 16000, 8000])
def test_997hz_sine_anchor(sr):
    """0 dBFS 997 Hz sine → −3.01 LUFS (BS.1770 calibration), and
    −20 dB linearity. Small tolerance covers the bilinear warp at
    low sample rates."""
    t = np.arange(3 * sr) / sr
    x = np.sin(2 * np.pi * 997 * t)
    assert abs(integrated_lufs(x, sr) - (-3.01)) < 0.06
    assert abs(integrated_lufs(0.1 * x, sr) - (-23.01)) < 0.06


def test_gating_ignores_silence():
    """Long digital silence around a tone must NOT drag the
    integrated number down (the −70/−10 gates exclude it). Blocks
    partially overlapping the tone edges legitimately count (they
    pass the relative gate), so the tone is long enough for the edge
    contribution to amortize; the ungated mean-square over the whole
    signal would read ~7 LU lower."""
    sr = 16000
    tone = 0.25 * np.sin(2 * np.pi * 997 * np.arange(4 * sr) / sr)
    padded = np.concatenate([np.zeros(8 * sr), tone, np.zeros(8 * sr)])
    gated = integrated_lufs(padded, sr)
    alone = integrated_lufs(tone, sr)
    assert abs(gated - alone) < 0.5
    ungated = alone + 10 * np.log10(len(tone) / len(padded))
    assert gated > ungated + 5


def test_silence_is_neg_inf():
    assert integrated_lufs(np.zeros(16000), 16000) == float("-inf")
    assert integrated_lufs(np.zeros(0), 16000) == float("-inf")


def test_loudness_stats_fields():
    sr = 16000
    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    st = loudness_stats(x, sr)
    assert abs(st["peak_dbfs"] - 20 * np.log10(0.5)) < 0.01
    # sine crest factor = 3.01 dB
    assert abs(st["crest_db"] - 3.01) < 0.05
    assert st["lufs"] < 0


def test_clip_loudness_spark(spark):
    """mapInArrow operator: malformed rows degrade (loud_ok=false),
    good rows match the single-node function."""
    from bdqc_spark.functions.audio import encode

    sr = 16000
    loud = 0.8 * np.sin(2 * np.pi * 997 * np.arange(2 * sr) / sr)
    quiet = 0.01 * np.sin(2 * np.pi * 997 * np.arange(2 * sr) / sr)
    rows = [
        ("a", encode(loud, "pcm_s16le"), sr, 2000, "pcm_s16le", "x"),
        ("b", encode(quiet, "flac"), sr, 2000, "flac", "x"),
        ("c", b"\x01", sr, 2000, "pcm_s16le", "x"),
        ("d", None, sr, 2000, "wav", "x"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )
    got = {r.clip_id: r for r in clip_loudness(df).collect()}
    assert got["a"].loud_ok and got["b"].loud_ok
    assert not got["c"].loud_ok and not got["d"].loud_ok
    assert abs(got["a"].lufs - integrated_lufs(loud, sr)) < 1e-6
    assert abs(got["b"].lufs - integrated_lufs(quiet * 32767 / 32767, sr)) < 0.01
    assert got["a"].lufs > got["b"].lufs + 30  # 0.8 vs 0.01 amplitude
    assert "bytes" not in clip_loudness(df).columns
