"""Room/channel artifact signals (functions/room.py): planted mains
hum is detected at the right fundamental, blind decay estimation
recovers synthetic-RIR RT60, and the Spark plumbing mirrors numpy.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdqc_spark.functions.room import clip_room, decay_stats, hum_levels, room_stats

SR = 16000


def _noise(seconds=3.0, seed=3, amp=0.2):
    rng = np.random.default_rng(seed)
    return amp * rng.standard_normal(int(seconds * SR))


def _with_hum(x, f0, amp=0.08):
    t = np.arange(x.shape[0]) / SR
    return x + amp * np.sin(2 * np.pi * f0 * t) + 0.4 * amp * np.sin(2 * np.pi * 2 * f0 * t)


def _bursts(rir_t60=None, seed=5):
    """Gated noise bursts, optionally convolved with a synthetic
    exponential-decay RIR of the given RT60."""
    r = np.random.default_rng(seed)
    x = np.zeros(4 * SR)
    for k in range(8):
        s = int(k * 0.5 * SR)
        x[s : s + int(0.1 * SR)] = r.standard_normal(int(0.1 * SR))
    if rir_t60:
        n = int(1.2 * rir_t60 * SR)
        h = np.exp(-6.91 * np.arange(n) / (rir_t60 * SR)) * r.standard_normal(n)
        h /= np.sqrt((h**2).sum())
        x = np.convolve(x, h)[: x.shape[0]]
    return 0.3 * x / np.abs(x).max()


def test_hum_detects_right_fundamental():
    clean = _noise()
    h_clean = hum_levels(clean, SR)
    h50 = hum_levels(_with_hum(clean, 50.0), SR)
    h60 = hum_levels(_with_hum(clean, 60.0), SR)
    assert abs(h_clean["hum_db_50"]) < 4 and abs(h_clean["hum_db_60"]) < 4
    assert h50["hum_db_50"] > 8 and h50["hum_db_60"] < 4
    assert h60["hum_db_60"] > 8 and h60["hum_db_50"] < 4
    # louder hum → bigger reading
    assert (
        hum_levels(_with_hum(clean, 50.0, amp=0.2), SR)["hum_db_50"]
        > h50["hum_db_50"]
    )
    # too short to resolve the fundamentals → no claim
    assert hum_levels(clean[: SR // 4], SR) is None


def test_decay_recovers_synthetic_rt60():
    d25 = decay_stats(_bursts(0.25), SR)
    d60 = decay_stats(_bursts(0.60), SR)
    assert d25 and d60
    assert 0.12 < d25["rt60_est"] < 0.45
    assert 0.35 < d60["rt60_est"] < 1.0
    assert d60["rt60_est"] > d25["rt60_est"]
    assert d25["n_decays"] >= 4 and d60["n_decays"] >= 4
    # dry gated audio exposes no SUSTAINED decay — "no evidence",
    # not a reverb reading
    assert decay_stats(_bursts(None), SR) is None
    # steady tone: no decays at all
    t = np.arange(2 * SR) / SR
    assert decay_stats(0.3 * np.sin(2 * np.pi * 220 * t), SR) is None


def test_room_stats_combined():
    # a quiet hum rides the reverberant bursts: both artifacts read
    # out. (A LOUD continuous hum floors the decay tails and biases
    # rt60 slow — physically expected: the tone bounds the observable
    # free decay.)
    st = room_stats(_with_hum(_bursts(0.4), 60.0, amp=0.01), SR)
    assert st["hum_db_60"] > st["hum_db_50"] + 3
    assert st["rt60_est"] is not None and 0.25 < st["rt60_est"] < 0.9


def test_clip_room_spark_matches_numpy(spark):
    from bdqc_spark.functions.audio import encode

    cases = {
        "hum50": _with_hum(_noise(seed=11), 50.0),
        "hum60": _with_hum(_noise(seed=12), 60.0),
        "rev": _bursts(0.5, seed=13),
        "clean": _noise(seed=14),
    }
    rows = [
        (k, encode(np.clip(v, -0.999, 0.999).astype(np.float32), "pcm_s16le"), SR, "pcm_s16le")
        for k, v in cases.items()
    ] + [("bad", b"\x00\x01", SR, "nosuch")]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int, codec string")
    out = clip_room(df)
    assert "bytes" not in out.columns
    got = {r.clip_id: r for r in out.collect()}
    assert not got["bad"].room_ok
    assert got["hum50"].hum_db_50 > 8 and got["hum50"].hum_db_60 < 4
    assert got["hum60"].hum_db_60 > 8
    assert got["rev"].rt60_est == pytest.approx(0.5, abs=0.25)
    # numpy twin parity through the SAME codec round trip
    from bdqc_spark.functions.audio import decode

    pcm = np.clip(cases["hum50"], -0.999, 0.999).astype(np.float32)
    twin = room_stats(decode(encode(pcm, "pcm_s16le"), "pcm_s16le"), SR)
    assert got["hum50"].hum_db_50 == pytest.approx(twin["hum_db_50"], abs=1e-6)
