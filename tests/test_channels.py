"""Channel-balance / phase QC (functions/channels.py): planted
dual-mono / phase-inverted / true-stereo / one-sided pairs classify
correctly, the downmix-loss measurement matches theory, mono and
corrupt rows degrade honestly, and the Spark pass agrees with the
single-node twin."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from bdqc_spark.functions.audio import decode_wav_channels, encode_wav
from bdqc_spark.functions.channels import channel_stats, clips_channel_stats

SR = 16000


def _stereo_wav(left: np.ndarray, right: np.ndarray, sr: int = SR) -> bytes:
    inter = np.empty(left.size * 2, np.float32)
    inter[0::2], inter[1::2] = left, right
    s16 = np.clip(np.round(inter * 32767), -32768, 32767).astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(s16))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
        + b"data"
        + struct.pack("<I", len(s16))
        + s16
    )


def _sig(seed: int | None = None) -> np.ndarray:
    t = np.arange(SR) / SR
    if seed is None:
        return (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal(SR)).astype(np.float32)


def test_channel_stats_classifies_planted_pairs():
    sig, noise = _sig(), _sig(3)
    cases = {
        "dualmono": (sig, sig),
        "inverted": (sig, (-sig).astype(np.float32)),
        "stereo": (sig, noise),
        "onesided": (sig, (0.05 * sig).astype(np.float32)),
    }
    got = {
        k: channel_stats(decode_wav_channels(_stereo_wav(l, r)))
        for k, (l, r) in cases.items()
    }
    assert got["dualmono"]["lr_corr"] > 0.99 and not got["dualmono"]["phase_inverted"]
    assert abs(got["dualmono"]["downmix_loss_db"]) < 0.1

    assert got["inverted"]["lr_corr"] < -0.99 and got["inverted"]["phase_inverted"]
    assert got["inverted"]["downmix_loss_db"] > 40.0  # destructive cancellation

    assert abs(got["stereo"]["lr_corr"]) < 0.1
    # uncorrelated equal-ish power downmixes ~3 dB down
    assert 2.0 < got["stereo"]["downmix_loss_db"] < 4.0

    assert got["onesided"]["balance_db"] > 20.0
    assert abs(got["onesided"]["downmix_loss_db"]) < 0.1  # coherent: no loss


def test_channel_stats_mono_and_degenerate():
    mono = decode_wav_channels(encode_wav(_sig(), SR, inner="pcm_s16le"))
    st = channel_stats(mono)
    assert st["channels"] == 1 and st["rms_l"] is not None
    assert st["lr_corr"] is None and st["phase_inverted"] is None
    # a silent channel leaves ratio/correlation honestly undefined
    z = np.zeros(SR, np.float32)
    st2 = channel_stats(decode_wav_channels(_stereo_wav(_sig(), z)))
    assert st2["balance_db"] is None and st2["lr_corr"] is None
    assert channel_stats(np.zeros((0, 2), np.float32))["rms_l"] is None


def test_clips_channel_stats_spark(spark):
    sig, noise = _sig(), _sig(3)
    rows = [
        ("dualmono", bytearray(_stereo_wav(sig, sig)), "wav"),
        ("inverted", bytearray(_stereo_wav(sig, (-sig).astype(np.float32))), "wav"),
        ("stereo", bytearray(_stereo_wav(sig, noise)), "wav"),
        ("mono", bytearray(encode_wav(sig, SR, inner="pcm_s16le")), "wav"),
        ("rawmono", bytearray(encode_wav(sig, SR, inner="pcm_s16le")[44:]), "pcm_s16le"),
        ("corrupt", bytearray(b"not a wav at all"), "wav"),
        ("nullrow", None, "wav"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.asDict() for r in clips_channel_stats(df).collect()}
    assert got["dualmono"]["chan_ok"] and got["dualmono"]["channels"] == 2
    assert got["inverted"]["phase_inverted"] is True
    assert got["inverted"]["downmix_loss_db"] > 40.0
    assert abs(got["stereo"]["lr_corr"]) < 0.1
    assert got["mono"]["channels"] == 1 and got["mono"]["lr_corr"] is None
    assert got["rawmono"]["chan_ok"] and got["rawmono"]["channels"] == 1
    assert got["corrupt"]["chan_ok"] is False
    assert got["nullrow"]["chan_ok"] is False
    # Spark values match the single-node twin exactly
    tw = channel_stats(decode_wav_channels(_stereo_wav(sig, noise)))
    assert abs(got["stereo"]["lr_corr"] - tw["lr_corr"]) < 1e-9
    assert abs(got["stereo"]["downmix_loss_db"] - tw["downmix_loss_db"]) < 1e-9
