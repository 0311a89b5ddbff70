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


def test_audio_features_pure_tone_centroid():
    """A pure tone's spectral centroid and mel energy must sit at the
    tone frequency (numpy-level check of the DSP core)."""
    import numpy as np

    from bdqc_spark.functions.audio_features import N_MELS, clip_features, mel_filterbank

    sr, f = 16000, 1000
    t = np.arange(sr) / sr
    pcm = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    feats = clip_features(pcm, sr)
    assert feats is not None
    assert abs(feats["spectral_centroid"] - f) < 100  # Hz
    assert feats["spectral_rolloff"] < 2 * f
    assert feats["spectral_flatness"] < 0.1  # a tone is anything but flat
    # mel energy peaks in the band whose filter covers 1 kHz
    fb = mel_filterbank(sr, max(int(round(sr * 0.025)), 2), N_MELS)
    bins = fb.shape[1]
    tone_bin = int(round(f / (sr / 2) * (bins - 1)))
    expected_band = int(np.argmax(fb[:, tone_bin]))
    assert abs(int(np.argmax(feats["mel_mean"])) - expected_band) <= 1
    # white-ish noise is much flatter than a tone
    rng = np.random.default_rng(5)
    noise = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    nfeats = clip_features(noise, sr)
    assert nfeats["spectral_flatness"] > 5 * feats["spectral_flatness"]


def test_audio_features_spark_end_to_end(spark):
    """mapInArrow plumbing: every decodable clip gets a fixed-width
    feature row, bytes never leaves the stage, corrupt rows degrade
    to feat_ok=false, and the extraction is deterministic."""
    from pyspark.sql import functions as F

    from bdqc_spark.functions.audio_features import N_MELS, extract_audio_features
    from bdqc_spark.synth.clips import generate_clips_df

    clips = generate_clips_df(spark, 120, seed=41)
    feats = extract_audio_features(clips)
    assert "bytes" not in feats.columns
    pdf = feats.toPandas()
    assert len(pdf) == 120
    ok = pdf[pdf.feat_ok]
    assert len(ok) > 100  # the corpus is mostly clean
    assert (ok.n_mels == N_MELS).all()
    assert all(len(v) == N_MELS for v in ok.mel_mean)
    assert (ok.n_frames > 0).all()
    assert ok.spectral_centroid.between(1, 8000).all()
    # corrupt/undecodable clips degrade, not crash
    bad = clips.withColumn(
        "bytes", F.when(F.xxhash64("clip_id") % 5 == 0, F.lit(b"\x00\x01")).otherwise(F.col("bytes"))
    )
    corrupted = {
        r.clip_id
        for r in bad.where(F.xxhash64("clip_id") % 5 == 0).select("clip_id").collect()
    }
    assert corrupted
    bpdf = extract_audio_features(bad).toPandas()
    assert len(bpdf) == 120
    assert not bpdf[bpdf.clip_id.isin(corrupted)].feat_ok.any()
    # determinism
    pdf2 = extract_audio_features(clips).toPandas().sort_values("clip_id")
    pdf1 = pdf.sort_values("clip_id")
    assert (pdf1.spectral_centroid.to_numpy() == pdf2.spectral_centroid.to_numpy()).all()
