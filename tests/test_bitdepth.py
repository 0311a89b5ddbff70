"""Effective bit-depth / requantization detection (functions/bitdepth.py)."""

from __future__ import annotations

import numpy as np

from bdqc_spark.functions.bitdepth import bitdepth_stats, clip_bitdepth

SR = 16000


def _noise16(n=4000, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(-20000, 20000, n).astype(np.int16)


def test_true_16bit_noise_reads_16():
    st = bitdepth_stats(_noise16())
    assert st == {"value_gcd": 1, "effective_bits": 16, "requantized": False}


def test_8bit_shift_upscale_detected():
    x8 = (_noise16() >> 8).astype(np.int16)  # 8-bit content
    st = bitdepth_stats((x8.astype(np.int32) << 8).astype(np.int16))
    assert st["value_gcd"] % 256 == 0
    assert st["effective_bits"] == 8 and st["requantized"]


def test_8bit_replicate_upscale_detected():
    x8 = (_noise16() >> 8).astype(np.int32)
    st = bitdepth_stats((x8 * 257).astype(np.int16))  # replicate conversion
    assert st["value_gcd"] % 257 == 0
    assert st["effective_bits"] == 8 and st["requantized"]


def test_12bit_grid_reads_12():
    x = ((_noise16().astype(np.int32) >> 4) << 4).astype(np.int16)
    st = bitdepth_stats(x)
    assert st["effective_bits"] == 12 and st["requantized"]


def test_14bit_grid_not_flagged():
    x = ((_noise16().astype(np.int32) >> 2) << 2).astype(np.int16)
    st = bitdepth_stats(x)
    assert st["effective_bits"] == 14 and not st["requantized"]


def test_no_evidence_conventions():
    assert bitdepth_stats(np.zeros(4000, dtype=np.int16)) is None  # silence
    assert bitdepth_stats(_noise16(100)) is None  # too short


def test_spark_pass(spark):
    rows = []
    for i in range(4):
        rows.append((f"t16-{i}", _noise16(seed=10 + i).tobytes(), SR, "pcm_s16le"))
        x8 = (_noise16(seed=20 + i) >> 8).astype(np.int32)
        rows.append((f"up8-{i}", (x8 << 8).astype(np.int16).tobytes(), SR, "pcm_s16le"))
    rows.append(("flt-0", np.zeros(4000, dtype="<f4").tobytes(), SR, "pcm_f32le"))
    rows.append(("sil-0", np.zeros(4000, dtype=np.int16).tobytes(), SR, "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    out = {r["clip_id"]: r.asDict() for r in clip_bitdepth(df).collect()}
    for i in range(4):
        assert out[f"t16-{i}"]["bd_ok"] and not out[f"t16-{i}"]["requantized"]
        assert out[f"up8-{i}"]["bd_ok"] and out[f"up8-{i}"]["effective_bits"] == 8
    assert not out["flt-0"]["bd_ok"]  # float wire: honest no-evidence
    assert not out["sil-0"]["bd_ok"]
