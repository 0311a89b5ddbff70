"""Ring-1 unit/property tests: audio codecs (SURVEY.md §5.2).

The per-row invariant from BASELINE.json:15: decoded PCM allclose /
SNR ≥ 30 dB vs the reference (pre-encode) signal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bdqc_spark.functions import audio


def _tone(sr=16000, dur_s=0.5, f=440.0, amp=0.5, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    x = amp * np.sin(2 * np.pi * f * t) + noise * rng.standard_normal(len(t))
    return np.clip(x, -1, 1)


@pytest.mark.parametrize("codec", audio.CODECS)
def test_roundtrip_snr_ge_30db(codec):
    pcm = _tone()
    dec = audio.decode(audio.encode(pcm, codec), codec)
    assert dec.shape == pcm.shape
    assert audio.snr_db(pcm, dec) >= 30.0


@pytest.mark.parametrize("codec", ["pcm_s16le", "pcm_f32le"])
def test_lossless_codecs_allclose(codec):
    pcm = _tone()
    dec = audio.decode(audio.encode(pcm, codec), codec)
    atol = 1e-4 if codec == "pcm_s16le" else 1e-7
    assert np.allclose(pcm, dec, atol=atol)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=2000),
    st.sampled_from(audio.CODECS),
    st.integers(min_value=0, max_value=10_000),
)
def test_roundtrip_property(n, codec, seed):
    rng = np.random.default_rng(seed)
    pcm = np.clip(rng.uniform(-1, 1, size=n) * rng.uniform(0.1, 1.0), -1, 1)
    dec = audio.decode(audio.encode(pcm, codec), codec)
    assert dec.shape == pcm.shape
    # companded codecs: relative quantization error bounded
    assert np.max(np.abs(dec - pcm)) < 0.02 + 0.02 * np.max(np.abs(pcm))


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        audio.decode(b"", "pcm_s16le")
    with pytest.raises(ValueError):
        audio.decode(b"\x01\x02\x03", "pcm_s16le")  # odd length
    with pytest.raises(ValueError):
        audio.decode(b"\x01\x02\x03", "pcm_f32le")  # not %4
    with pytest.raises(ValueError):
        audio.decode(b"", "ulaw")
    with pytest.raises(ValueError):
        audio.decode(b"\x00" * 8, "flac")  # unknown codec


def test_profile_batch_stats():
    pcm = _tone(amp=0.5, noise=0.0)
    raw = audio.encode(pcm, "pcm_s16le")
    df = audio.profile_batch(
        pd.Series([raw, b"", None]),
        pd.Series(["pcm_s16le", "pcm_s16le", "ulaw"]),
        pd.Series([16000, 16000, 8000]),
    )
    assert bool(df.loc[0, "pcm_ok"]) and not bool(df.loc[1, "pcm_ok"]) and not bool(df.loc[2, "pcm_ok"])
    assert df.loc[0, "n_samples"] == len(pcm)
    assert df.loc[0, "dur_ms_decoded"] == 500
    # RMS of a 0.5-amp sine ≈ 0.5/√2
    assert abs(df.loc[0, "rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert df.loc[0, "clip_rate"] == 0.0
    assert abs(df.loc[0, "dc_off"]) < 1e-3
