"""Clip segmentation (functions/segment.py) — byte-slice windowing
into fixed-length training segments."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions import audio
from bdqc_spark.functions.segment import segment_clips


def _tone(sr=16000, dur_s=3.5, f=440.0, amp=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    return np.clip(
        amp * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t)), -1, 1
    )


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec"])
    )


@pytest.mark.parametrize("codec", ["pcm_s16le", "pcm_f32le", "ulaw", "alaw"])
def test_segments_are_exact_payload_slices(spark, codec):
    sr = 16000
    pcm = _tone(sr=sr)
    raw = audio.encode(pcm, codec)
    df = _df(spark, [("c0", raw, sr, 3500, codec)])
    out = segment_clips(df, win_ms=1000).toPandas().sort_values("seg_index")
    assert len(out) == 3  # 3.5 s → 3 full windows, tail dropped
    assert (out.seg_codec == codec).all()
    assert (out.seg_n_samples == sr).all()
    full = audio.decode(raw, codec)
    for _, r in out.iterrows():
        seg = audio.decode(bytes(r.seg_bytes), r.seg_codec)
        lo = r.seg_index * sr
        assert np.array_equal(seg, full[lo : lo + sr])


def test_segment_overlap(spark):
    sr = 8000
    pcm = _tone(sr=sr, dur_s=3.0)
    raw = audio.encode(pcm, "pcm_s16le")
    df = _df(spark, [("c0", raw, sr, 3000, "pcm_s16le")])
    out = segment_clips(df, win_ms=1000, hop_ms=500).toPandas()
    # floor((24000 - 8000) / 4000) + 1 = 5 windows
    assert len(out) == 5
    assert sorted(out.seg_index) == [0, 1, 2, 3, 4]


def test_segment_wav_mono_unwraps_inner_codec(spark):
    sr = 16000
    pcm = _tone(sr=sr)
    raw = audio.encode_wav(pcm, sr, inner="ulaw")
    df = _df(spark, [("c0", raw, sr, 3500, "wav")])
    out = segment_clips(df, win_ms=1000).toPandas().sort_values("seg_index")
    assert len(out) == 3
    assert (out.seg_codec == "ulaw").all()
    full = audio.decode(raw, "wav")
    for _, r in out.iterrows():
        seg = audio.decode(bytes(r.seg_bytes), "ulaw")
        lo = r.seg_index * sr
        assert np.array_equal(seg, full[lo : lo + sr])


def test_segment_wav_stereo_downmixes(spark):
    sr = 16000
    pcm = _tone(sr=sr)
    raw = audio.encode_wav(pcm, sr, inner="pcm_s16le", channels=2)
    df = _df(spark, [("c0", raw, sr, 3500, "wav")])
    out = segment_clips(df, win_ms=1000).toPandas().sort_values("seg_index")
    assert len(out) == 3
    assert (out.seg_codec == "pcm_s16le").all()
    full = audio.decode(raw, "wav")  # mono downmix
    for _, r in out.iterrows():
        seg = audio.decode(bytes(r.seg_bytes), "pcm_s16le")
        lo = r.seg_index * sr
        assert audio.snr_db(full[lo : lo + sr], seg) >= 40.0


def test_segment_skips_corrupt_and_short(spark):
    sr = 16000
    ok = audio.encode(_tone(sr=sr), "pcm_s16le")
    rows = [
        ("good", ok, sr, 3500, "pcm_s16le"),
        ("odd", ok[:2001], sr, 3500, "pcm_s16le"),  # not sample-aligned
        ("null", None, sr, 3500, "pcm_s16le"),
        ("short", audio.encode(_tone(sr=sr, dur_s=0.3), "pcm_s16le"), sr, 300, "pcm_s16le"),
        ("badwav", b"RIFFxxxx", sr, 1000, "wav"),
    ]
    out = segment_clips(_df(spark, rows), win_ms=1000).toPandas()
    assert set(out.clip_id) == {"good"}
    assert len(out) == 3


def test_segment_corpus_end_to_end(spark):
    from bdqc_spark.synth.clips import generate_clips_df

    clips = generate_clips_df(spark, 80, seed=53, include_labels=True)
    out = segment_clips(clips, win_ms=500).toPandas()
    # every segment id is unique and indexes are dense per clip
    assert out.seg_id.is_unique
    for cid, g in out.groupby("clip_id"):
        assert sorted(g.seg_index) == list(range(len(g)))
    # segments exist for the bulk of the corpus (clips are ≥300 ms;
    # corrupt class A rows are skipped)
    assert out.clip_id.nunique() >= 60
