"""Within-clip loop detection (functions/loops.py)."""

from __future__ import annotations

import numpy as np

from bdqc_spark.functions.loops import LOOP_SCORE_MIN, clip_loops, loop_stats

SR = 16000


def _nat_speech(sec=8.0, seed=1):
    """Jittered noise bursts — natural (non-metronomic) cadence."""
    r = np.random.default_rng(seed)
    n = int(SR * sec)
    x = np.zeros(n)
    t = 0
    while t < n:
        b = int(SR * r.uniform(0.1, 0.4))
        g = int(SR * r.uniform(0.05, 0.3))
        x[t : t + b] = r.normal(0, 0.2, min(b, max(n - t, 0)))
        t += b + g
    return x.astype(np.float32)


def test_tiled_clip_detected_with_period():
    seg = _nat_speech(2.0, seed=7)
    st = loop_stats(np.tile(seg, 4), SR)
    assert st["looped"] and st["loop_score"] > 0.95
    assert st["loop_lag_ms"] % 2000 == 0  # the period or a multiple


def test_natural_speech_not_flagged():
    for seed in range(3, 10):
        st = loop_stats(_nat_speech(8.0, seed), SR)
        assert st is not None
        assert not st["looped"], (seed, st)
        assert st["loop_score"] < LOOP_SCORE_MIN


def test_no_evidence_conventions():
    # steady tone: flat envelope -> CV floor
    t = np.arange(int(SR * 8)) / SR
    assert loop_stats((0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), SR) is None
    assert loop_stats(np.zeros(SR * 8, dtype=np.float32), SR) is None  # silent
    assert loop_stats(_nat_speech(1.5, 2), SR) is None  # < 2x min lag
    assert loop_stats(np.array([], dtype=np.float32), SR) is None


def _s16(x):
    return (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()


def test_spark_pass_partitions_kinds(spark):
    rows = []
    for i in range(4):
        rows.append((f"nat-{i}", _s16(_nat_speech(6.0, 20 + i)), SR, "pcm_s16le"))
        seg = _nat_speech(1.5, 30 + i)
        rows.append((f"loop-{i}", _s16(np.tile(seg, 4)), SR, "pcm_s16le"))
    rows.append(("sil-0", _s16(np.zeros(SR * 4)), SR, "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    out = {r["clip_id"]: r.asDict() for r in clip_loops(df).collect()}
    for i in range(4):
        assert out[f"nat-{i}"]["loop_ok"] and not out[f"nat-{i}"]["looped"]
        assert out[f"loop-{i}"]["loop_ok"] and out[f"loop-{i}"]["looped"]
    assert not out["sil-0"]["loop_ok"]
