"""Speech/music discrimination (functions/music.py)."""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions.music import (
    LOW_ENERGY_MIN,
    MOD_RATIO_MIN,
    clip_music,
    music_stats,
)

SR = 16000


def _speech(sec=5.0, seed=5):
    """Syllabic bursts: 150 ms noise on / 100 ms off (4 Hz rate)."""
    rng = np.random.default_rng(seed)
    n = int(SR * sec)
    x = np.zeros(n)
    t = 0
    while t < n:
        burst, gap = int(SR * 0.15), int(SR * 0.10)
        x[t : t + burst] = rng.normal(0, 0.2, min(burst, max(n - t, 0)))
        t += burst + gap
    return x.astype(np.float32)


def _music(sec=5.0):
    """Sustained triad with slow (0.5 Hz) tremolo."""
    t = np.arange(int(SR * sec)) / SR
    x = sum(0.15 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.18, 329.63))
    x *= 1.0 + 0.2 * np.sin(2 * np.pi * 0.5 * t)
    return x.astype(np.float32)


def _tone(sec=5.0):
    t = np.arange(int(SR * sec)) / SR
    return (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def _am_noise(sec=5.0, seed=9):
    """Continuous noise amplitude-modulated at the syllabic 4 Hz —
    speech-shaped envelope without discrete pauses."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * sec)) / SR
    env = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t))
    return (env * rng.normal(0, 0.2, len(t))).astype(np.float32)


def test_speech_like_not_flagged():
    for x in (_speech(), _am_noise()):
        st = music_stats(x, SR)
        assert st is not None and not st["music_like"]
        assert st["mod_ratio_2_8hz"] > MOD_RATIO_MIN
        assert st["low_energy_frac"] > LOW_ENERGY_MIN


def test_sustained_material_flagged_music_like():
    for x in (_music(), _tone()):
        st = music_stats(x, SR)
        assert st is not None and st["music_like"]
        assert st["mod_ratio_2_8hz"] < MOD_RATIO_MIN
        assert st["low_energy_frac"] < LOW_ENERGY_MIN


def test_no_evidence_conventions():
    assert music_stats(np.zeros(SR * 3, dtype=np.float32), SR) is None  # silent
    assert music_stats(_speech(1.0), SR) is None  # < MUS_MIN_FRAMES
    assert music_stats(np.array([], dtype=np.float32), SR) is None
    assert music_stats(_speech(3.0), 0) is None


def test_flux_separates_too():
    assert (
        music_stats(_speech(), SR)["spectral_flux"]
        > music_stats(_tone(), SR)["spectral_flux"]
    )


def test_determinism():
    a = music_stats(_speech(), SR)
    b = music_stats(_speech(), SR)
    assert a == b


def _s16(x: np.ndarray) -> bytes:
    return (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()


def test_spark_pass_partitions_kinds(spark):
    rows = []
    for i in range(6):
        rows.append((f"sp-{i}", _s16(_speech(seed=i + 1)), SR, "pcm_s16le"))
        rows.append((f"mu-{i}", _s16(_music(3.0 + 0.3 * i)), SR, "pcm_s16le"))
    rows.append(("bad-0", b"\x00\x01", SR, "pcm_s16le"))  # too short
    rows.append(("null-0", None, SR, "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    out = {r["clip_id"]: r.asDict() for r in clip_music(df).collect()}
    assert len(out) == 14
    for i in range(6):
        sp, mu = out[f"sp-{i}"], out[f"mu-{i}"]
        assert sp["music_ok"] and not sp["music_like"]
        assert mu["music_ok"] and mu["music_like"]
    assert not out["bad-0"]["music_ok"] and not out["bad-0"]["music_like"]
    assert not out["null-0"]["music_ok"]


def test_synth_corpus_reads_as_sustained_tonal(spark):
    """The synthesized corpus's PCM is sustained sines + noise by
    construction (synth/clips.py _synth_pcm) — no syllabic envelope —
    so the discriminator must read it as sustained/tonal. This is
    exactly why the signal ships as a standalone profile column and
    is NOT wired into the pipeline's keep/drop rules for this corpus:
    the honest measurement would drop everything."""
    from bdqc_spark.synth.clips import generate_clips_df

    clips = generate_clips_df(spark, 120, seed=3).select(
        "clip_id", "bytes", "sr_hz", "codec"
    )
    out = clip_music(clips).where("music_ok").toPandas()
    assert len(out) > 60  # most clips yield evidence (>= 1.5 s, decodable)
    assert out["music_like"].mean() > 0.6  # tone-dominated by design
