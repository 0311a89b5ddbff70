"""Shifted-copy audio alignment (functions/align.py).

Contract: trimmed/padded copies of the same recording — which the
equal-length-blocked fingerprint path can never pair — are recovered
with the correct signed offset, while distinct-content clips that
slip through the Hamming gate are rejected by the cross-correlation
verify (precision lives in the verify stage, not the LSH)."""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions import audio
from bdqc_spark.functions.align import (
    MAX_ENV_FRAMES,
    clip_envelope,
    xcorr_align,
)
from bdqc_spark.synth.clips import _synth_pcm


def _am_clip(i: int):
    """Deterministic clip i: _synth_pcm carrier under an aperiodic
    ~40 Hz-knot amplitude modulation (speech-like temporal structure
    — a flat stationary envelope carries no alignment signal, see the
    module docstring)."""
    r = np.random.default_rng([317, i])
    sr = int(r.choice([8000, 16000, 22050]))
    dur_ms = int(r.integers(1500, 3500))
    carrier = _synth_pcm(r, sr, dur_ms)
    n = len(carrier)
    k = max(n // (sr // 40), 4)
    m = np.convolve(r.normal(0, 1, k + 6), np.ones(6) / 6, "same")
    mod = np.interp(np.arange(n) * (k - 1) / (n - 1), np.arange(len(m)), m)
    mod = 0.15 + 0.85 * (mod - mod.min()) / (np.ptp(mod) + 1e-9)
    return np.clip(carrier * mod, -1, 1).astype(np.float32), sr


# ---- xcorr_align unit ------------------------------------------------------

def test_xcorr_recovers_exact_lags():
    r = np.random.default_rng(7)
    a = r.normal(0, 1, 500)
    lag, ncc = xcorr_align(a, a[30:])       # trim -> b[t] = a[t+30]
    assert lag == 30 and ncc > 0.99
    b = np.concatenate([r.normal(0, 1, 25), a])  # pad -> lag = -25
    lag, ncc = xcorr_align(a, b)
    assert lag == -25 and ncc > 0.99
    lag, ncc = xcorr_align(a, a)
    assert lag == 0 and ncc > 0.99


def test_xcorr_uncorrelated_is_low_and_empty_is_zero():
    r = np.random.default_rng(8)
    a, b = r.normal(0, 1, 400), r.normal(0, 1, 380)
    _, ncc = xcorr_align(a, b)
    assert ncc < 0.5
    assert xcorr_align(np.array([]), a) == (0, 0.0)
    # constant envelopes: zero variance, must not blow up
    assert xcorr_align(np.ones(50), np.ones(40))[1] == pytest.approx(0.0, abs=1e-3)


def test_xcorr_min_overlap_bounds_the_search():
    """A lag that would leave < min_overlap_frac of the shorter clip
    overlapped must not be chosen even if its raw correlation wins."""
    r = np.random.default_rng(9)
    a = r.normal(0, 1, 200)
    b = r.normal(0, 1, 200)
    b[:20] = a[-20:]  # perfect 20-frame tail/head splice = lag +180
    lag, _ = xcorr_align(a, b, min_overlap_frac=0.5)
    assert lag != 180
    lag, ncc = xcorr_align(a, b, min_overlap_frac=0.05)
    assert lag == 180 and ncc > 0.9


# ---- clip_envelope ---------------------------------------------------------

def test_envelope_short_clip_is_none_and_hop_is_10ms():
    assert clip_envelope(np.zeros(10, np.float32), 16000) is None
    pcm, sr = _am_clip(0)
    env, hop_ms = clip_envelope(pcm, sr)
    assert abs(hop_ms - 10.0) < 0.5
    assert abs(float(env.mean())) < 1e-4  # centred


def test_envelope_long_clip_is_mean_pooled():
    sr = 8000
    r = np.random.default_rng(11)
    pcm = r.normal(0, 0.1, sr * 60).astype(np.float32)  # 60 s ≈ 6000 frames
    env, hop_ms = clip_envelope(pcm, sr)
    assert len(env) <= MAX_ENV_FRAMES
    assert hop_ms == pytest.approx(20.0, abs=0.5)  # pooled by k=2


def test_envelope_alignment_on_trimmed_and_padded_audio():
    pcm, sr = _am_clip(3)
    ea, hop = clip_envelope(pcm, sr)
    # trim 200 ms -> lag = +20 frames
    eb, _ = clip_envelope(pcm[int(0.2 * sr):], sr)
    lag, ncc = xcorr_align(ea, eb)
    assert lag == 20 and ncc > 0.9
    # pad 150 ms of room tone -> lag = -15 frames
    lead = np.random.default_rng(99).normal(0, 0.02, int(0.15 * sr)).astype(np.float32)
    ec, _ = clip_envelope(np.concatenate([lead, pcm]), sr)
    lag, ncc = xcorr_align(ea, ec)
    assert lag == -15 and ncc > 0.7
    # non-hop-multiple trim (253 ms): nearest frame, still confident
    ed, _ = clip_envelope(pcm[int(0.253 * sr):], sr)
    lag, ncc = xcorr_align(ea, ed)
    assert lag in (25, 26) and ncc > 0.9


def test_alignment_survives_reencoding():
    """Trim + µ-law re-encode together (the realistic composite case:
    a telephony copy of a trimmed upload)."""
    pcm, sr = _am_clip(5)
    ea, _ = clip_envelope(pcm, sr)
    tp = audio.decode(audio.encode(pcm[int(0.3 * sr):], "ulaw"), "ulaw")
    eb, _ = clip_envelope(np.asarray(tp, np.float64), sr)
    lag, ncc = xcorr_align(ea, eb)
    assert lag == 30 and ncc > 0.9


def test_active_profile_rejects_burst_coincidence():
    """Two mostly-silent clips with one burst each align perfectly at
    the envelope level once the bursts coincide (the class-H failure
    mode that motivated the active-frame gate): the xcorr alone would
    pair them, the active-frame spectral profile must not."""
    from bdqc_spark.functions.align import ACT_L2_DEFAULT, clip_align_features

    def h_clip(i):
        r = np.random.default_rng([53, i])
        sr = 16000
        dur = int(r.integers(1500, 3500))
        n = sr * dur // 1000
        pcm = _synth_pcm(r, sr, dur)
        keep = max(int(n * float(r.uniform(0.05, 0.15))), 1)
        at = int(r.integers(0, n - keep + 1))
        quiet = r.normal(0, 2e-4, n)
        quiet[at:at + keep] = pcm[at:at + keep]
        return np.clip(quiet, -1, 1).astype(np.float32), sr

    feats = [clip_align_features(*h_clip(i)) for i in range(8)]
    for i in range(8):
        for j in range(i + 1, 8):
            l2 = float(np.sqrt(((feats[i][3] - feats[j][3]) ** 2).sum()))
            assert l2 > ACT_L2_DEFAULT, (i, j, l2)
    # while a trimmed twin of an H clip stays inside the gate
    pcm, sr = h_clip(0)
    twin = clip_align_features(pcm[3200:], sr)
    l2 = float(np.sqrt(((feats[0][3] - twin[3]) ** 2).sum()))
    assert l2 <= ACT_L2_DEFAULT, l2


# ---- Spark end-to-end ------------------------------------------------------

def test_audio_aligned_dup_pairs_end_to_end(spark):
    """Corpus with injected trimmed/padded twins (which differ in
    length, so audio_dup_pairs' equal-frame blocking CANNOT pair
    them): audio_aligned_dup_pairs recovers every twin with the
    correct signed offset and links no distinct-content pair."""
    from bdqc_spark.functions.align import audio_aligned_dup_pairs

    rows, want = [], {}
    for i in range(24):
        pcm, sr = _am_clip(i)
        rows.append((f"c{i:03d}", audio.encode(pcm, "pcm_s16le"), sr, "pcm_s16le"))
        if i % 6 == 0:  # trimmed twin: starts 200 ms later -> offset +200
            twin = pcm[int(0.2 * sr):]
            rows.append((f"c{i:03d}::cut", audio.encode(twin, "pcm_s16le"), sr, "pcm_s16le"))
            want[(f"c{i:03d}", f"c{i:03d}::cut")] = 200.0
        elif i % 6 == 3:  # padded twin (µ-law re-encode): 150 ms lead -> -150
            lead = np.random.default_rng([9, i]).normal(0, 0.02, int(0.15 * sr))
            twin = np.clip(np.concatenate([lead, pcm]), -1, 1).astype(np.float32)
            rows.append((f"c{i:03d}::pad", audio.encode(twin, "ulaw"), sr, "ulaw"))
            want[(f"c{i:03d}", f"c{i:03d}::pad")] = -150.0
    rows.append(("bad", b"\x01\x02", 16000, "wav"))
    rows.append(("nul", None, 16000, "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int, codec string")

    got = {
        (r.id_a, r.id_b): (r.offset_ms, r.xcorr)
        for r in audio_aligned_dup_pairs(df).collect()
    }
    for pair, off in want.items():
        key = pair if pair in got else (pair[1], pair[0])
        assert key in got, pair
        got_off = got[key][0] if key == pair else -got[key][0]
        assert got_off == pytest.approx(off, abs=15.0), (pair, got[key])
        assert got[key][1] >= 0.6
    for a, b in got:
        assert a.split("::")[0] == b.split("::")[0], (a, b, got[(a, b)])
