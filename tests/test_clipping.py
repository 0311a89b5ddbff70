"""Clipping/dynamics signals (functions/clipping.py) — no SQL twin
for the decode, so semantics are gated here: analytic recovery on
known waveforms (hard-clipped sine, square, sine, DC), run-length
exactness, and Spark↔numpy parity through the wire format."""

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

from bdqc_spark.functions.clipping import CLIP_THR, clip_clipping, clipping_stats

SR = 16000


def _encode(pcm: np.ndarray) -> bytes:
    q = np.clip(np.round(np.asarray(pcm, dtype=np.float64) * 32767.0), -32768, 32767)
    return q.astype("<i2").tobytes()


def _decode(raw: bytes) -> np.ndarray:
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / np.float32(32767.0)


def test_clean_sine_crest_and_no_clipping():
    t = np.arange(SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    st = clipping_stats(x)
    assert st["clipped_frac"] == 0.0
    assert st["max_clip_run"] == 0
    assert st["crest_db"] == pytest.approx(20 * np.log10(np.sqrt(2)), abs=0.01)
    assert st["dc_offset"] == pytest.approx(0.0, abs=1e-4)


def test_hard_clipped_sine_analytics():
    """Sine driven to 2× full scale then clipped: a sample clips when
    |sin| ≥ 0.5, which is 2·(1/3) of each period → clipped_frac ≈ 2/3;
    each clipped stretch lasts arcsin-bounded 1/3 of a half-period."""
    t = np.arange(SR) / SR
    x = np.clip(2.0 * np.sin(2 * np.pi * 100.0 * t), -1.0, 1.0)
    st = clipping_stats(x)
    assert st["clipped_frac"] == pytest.approx(2.0 / 3.0, abs=0.01)
    # half-period = SR/(2·100) = 80 samples; clipped run = 2/3 of it
    assert st["max_clip_run"] == pytest.approx(80 * 2 / 3, abs=2)
    # flat-topped wave → crest well below a sine's 3.01 dB
    assert st["crest_db"] < 1.5


def test_square_wave_crest_zero():
    x = np.where(np.arange(SR) % 100 < 50, 1.0, -1.0)
    st = clipping_stats(x)
    assert st["crest_db"] == pytest.approx(0.0, abs=1e-9)
    assert st["clipped_frac"] == 1.0
    # |±1| both sit at the rail, so the run spans the whole signal
    assert st["max_clip_run"] == SR


def test_dc_offset_detected():
    rng = np.random.default_rng(0)
    x = 0.1 + 0.01 * rng.standard_normal(SR)
    st = clipping_stats(x)
    assert st["dc_offset"] == pytest.approx(0.1, abs=1e-3)
    assert st["clipped_frac"] == 0.0


def test_single_transient_vs_flat_top():
    """Same clipped_frac order, very different max_clip_run — the
    signal the run-length column exists to separate."""
    x = 0.1 * np.ones(1000)
    x[500] = 1.0  # one-sample pop
    pop = clipping_stats(x)
    y = 0.1 * np.ones(1000)
    y[500:540] = 1.0  # flat top
    flat = clipping_stats(y)
    assert pop["max_clip_run"] == 1
    assert flat["max_clip_run"] == 40


def test_int16_rails_count_as_clipped():
    """Both rails clip after the wire format: +32767 decodes to 1.0,
    −32768 to slightly below −1.0 — both ≥ CLIP_THR."""
    raw = np.array([32767, -32768, 0, 16000], dtype="<i2").tobytes()
    st = clipping_stats(_decode(raw))
    assert st["clipped_frac"] == pytest.approx(0.5)
    assert CLIP_THR < 1.0


def test_empty_returns_none():
    assert clipping_stats(np.zeros(0)) is None


_SCHEMA = StructType(
    [
        StructField("clip_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("codec", StringType()),
        StructField("sr_hz", IntegerType()),
    ]
)


def test_spark_numpy_twin_parity(spark):
    t = np.arange(SR // 2) / SR
    clips = [
        (0, _encode(np.clip(2.0 * np.sin(2 * np.pi * 100.0 * t), -1, 1)), "pcm_s16le", SR),
        (1, _encode(0.5 * np.sin(2 * np.pi * 440.0 * t)), "pcm_s16le", SR),
        (2, None, "pcm_s16le", SR),
        (3, _encode(0.3 * np.sin(2 * np.pi * 200.0 * t)), "opus", SR),
    ]
    df = spark.createDataFrame(clips, _SCHEMA)
    out = {r["clip_id"]: r for r in clip_clipping(df).collect()}
    for cid, raw, codec, _sr in clips:
        r = out[cid]
        if raw is None or codec != "pcm_s16le":
            assert not r["clip_ok"]
            assert r["clipped_frac"] != r["clipped_frac"]  # NaN convention
            continue
        st = clipping_stats(_decode(raw))
        assert r["clip_ok"]
        assert r["clipped_frac"] == pytest.approx(st["clipped_frac"], abs=1e-12)
        assert r["max_clip_run"] == st["max_clip_run"]
        assert r["crest_db"] == pytest.approx(st["crest_db"], abs=1e-9)
        assert r["dc_offset"] == pytest.approx(st["dc_offset"], abs=1e-12)


# ------------------------------------------------------------- dropouts
def test_dropout_detection():
    from bdqc_spark.functions.clipping import DROPOUT_MIN_MS, dropout_stats

    rng = np.random.default_rng(9)
    pcm = (0.3 * rng.standard_normal(SR)).astype(np.float32)  # 1 s active
    # plant two dropouts: 40 ms and 25 ms; and one sub-threshold 5 ms gap
    for start_ms, len_ms in ((200, 40), (600, 25), (800, 5)):
        s = int(SR * start_ms / 1000)
        pcm[s : s + int(SR * len_ms / 1000)] = 0.0
    st = dropout_stats(pcm, SR)
    assert st["n_dropouts"] == 2
    assert st["max_dropout_ms"] == pytest.approx(40.0, abs=1.0)
    assert st["dropout_frac"] == pytest.approx(0.065, abs=0.005)
    assert DROPOUT_MIN_MS == 20.0


def test_dropout_edges_excluded():
    from bdqc_spark.functions.clipping import dropout_stats

    rng = np.random.default_rng(10)
    active = (0.3 * rng.standard_normal(SR // 2)).astype(np.float32)
    # 300 ms leading + 300 ms trailing silence: NOT dropouts
    lead = np.zeros(int(SR * 0.3), np.float32)
    st = dropout_stats(np.concatenate([lead, active, lead]), SR)
    assert st["n_dropouts"] == 0 and st["dropout_frac"] == 0.0
    # all-silent clip: zero dropouts (the silent rule owns it)
    st = dropout_stats(np.zeros(SR, np.float32), SR)
    assert st == {"n_dropouts": 0, "max_dropout_ms": 0.0, "dropout_frac": 0.0}
    assert dropout_stats(np.zeros(0, np.float32), SR) is None


def test_dropout_spark_parity(spark):
    from bdqc_spark.functions.clipping import dropout_stats

    rng = np.random.default_rng(11)
    pcm = (0.3 * rng.standard_normal(SR)).astype(np.float32)
    pcm[4000 : 4000 + 640] = 0.0  # 40 ms at 16 kHz
    df = spark.createDataFrame([(0, _encode(pcm), "pcm_s16le", SR)], _SCHEMA)
    r = clip_clipping(df).collect()[0]
    st = dropout_stats(_decode(_encode(pcm)), SR)
    assert r["n_dropouts"] == st["n_dropouts"] == 1
    assert r["max_dropout_ms"] == pytest.approx(st["max_dropout_ms"], abs=1e-9)
    assert r["dropout_frac"] == pytest.approx(st["dropout_frac"], abs=1e-12)
