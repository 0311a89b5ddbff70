"""Acoustic fingerprint near-dup detection (functions/audio_fingerprint.py).

Codec robustness is the contract: the same recording re-encoded under
every supported wire format must land within the Hamming-3 /
profile-L2 gates, while distinct recordings must not.
"""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions import audio
from bdqc_spark.functions.audio_fingerprint import (
    VERIFY_L2_DEFAULT,
    clip_fingerprint,
)
from bdqc_spark.synth.clips import _synth_pcm


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _corpus_pcm(i: int):
    """Deterministic synthetic clip i: (pcm float32, sr)."""
    r = np.random.default_rng([91, i])
    sr = int(r.choice([8000, 16000, 22050, 44100], p=[0.1, 0.7, 0.1, 0.1]))
    dur = int(r.integers(400, 3000))
    return _synth_pcm(r, sr, dur).astype(np.float32), sr


def test_fingerprint_deterministic():
    pcm, sr = _corpus_pcm(0)
    a = clip_fingerprint(pcm, sr)
    b = clip_fingerprint(pcm.copy(), sr)
    assert a[0] == b[0] and a[1] == b[1]
    assert np.array_equal(a[2], b[2])


def test_fingerprint_short_or_silent_is_none():
    assert clip_fingerprint(np.zeros(10, np.float32), 16000) is None
    assert clip_fingerprint(np.zeros(16000, np.float32), 16000) is None


def test_fingerprint_codec_robustness():
    """Every supported re-encode of the same clip stays within the
    candidate gate (Hamming <= 3, equal frame count) AND the verify
    gate (profile L2 <= default bound) — including 4-bit IMA ADPCM,
    the noisiest codec on the wire."""
    worst_ham, worst_l2 = 0, 0.0
    for i in range(25):
        pcm, sr = _corpus_pcm(i)
        fp0, nf0, pr0 = clip_fingerprint(
            audio.decode(audio.encode(pcm, "pcm_s16le"), "pcm_s16le"), sr
        )
        variants = [
            audio.decode(audio.encode(pcm, "ulaw"), "ulaw"),
            audio.decode(audio.encode(pcm, "alaw"), "alaw"),
            audio.decode(audio.encode(pcm, "pcm_f32le"), "pcm_f32le"),
            audio.decode(audio.encode_wav(pcm, sr, inner="pcm_u8"), "wav"),
            audio.decode(audio.encode_wav(pcm, sr, inner="ulaw"), "wav"),
            audio.decode(audio.encode_wav(pcm, sr, inner="adpcm_ima"), "wav"),
        ]
        for dec in variants:
            fp1, nf1, pr1 = clip_fingerprint(dec, sr)
            assert nf1 == nf0  # re-encodes decode to identical length
            h = _ham(fp0, fp1)
            l2 = float(np.sqrt(((pr0 - pr1) ** 2).sum()))
            worst_ham, worst_l2 = max(worst_ham, h), max(worst_l2, l2)
    assert worst_ham <= 3, worst_ham
    assert worst_l2 <= VERIFY_L2_DEFAULT, worst_l2


def test_fingerprint_separates_distinct_content():
    fps = [clip_fingerprint(*_corpus_pcm(i))[0] for i in range(30)]
    d = [_ham(fps[i], fps[j]) for i in range(30) for j in range(i + 1, 30)]
    assert np.mean(d) > 8.0  # band support genuinely differs across clips


def test_hamming_neighbors_fp_exact_vs_bruteforce(spark):
    """The generic block-permutation join with an extra blocking
    column finds EXACTLY the brute-force pair set."""
    from bdqc_spark.operators.dedup import hamming_neighbors_fp

    rng = np.random.default_rng(5)
    n = 120
    base = rng.integers(-(2**62), 2**62, 12, dtype=np.int64)
    fps = [int(base[i % 12]) ^ int(rng.integers(0, 2) << int(rng.integers(0, 64)))
           for i in range(n)]
    grp = [int(i % 3) for i in range(n)]  # extra blocking column
    rows = [(f"id{i:03d}", fps[i], grp[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "id string, fp long, grp int")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_neighbors_fp(
            df, "id", "fp", max_hamming=3, block_cols=("grp",)
        ).collect()
    }
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            h = _ham(fps[i], fps[j])
            if h <= 3 and grp[i] == grp[j]:
                want.add((f"id{i:03d}", f"id{j:03d}", h))
    assert got == want and len(want) > 0


def test_audio_dup_pairs_end_to_end(spark):
    """Spark path: a corpus with injected cross-codec duplicates →
    audio_dup_pairs recovers every injected pair (recall 1.0) and
    links no clip to a differently-seeded clip (precision on
    known-distinct content)."""
    from bdqc_spark.functions.audio_fingerprint import audio_dup_pairs

    rows = []
    n = 40
    for i in range(n):
        pcm, sr = _corpus_pcm(i)
        rows.append((f"c{i:03d}", audio.encode(pcm, "pcm_s16le"), sr, "pcm_s16le"))
        if i % 2 == 0:  # every even clip gets a cross-codec twin
            enc = ["ulaw", "alaw", "wav"][i % 3]
            raw = (
                audio.encode_wav(pcm, sr, inner="adpcm_ima")
                if enc == "wav"
                else audio.encode(pcm, enc)
            )
            rows.append((f"c{i:03d}::re", raw, sr, enc))
    # plus a corrupt row and a null row: must be ignored, not crash
    rows.append(("bad", b"\x01\x02\x03", 16000, "wav"))
    rows.append(("nul", None, 16000, "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int, codec string")

    pairs = {(r.id_a, r.id_b) for r in audio_dup_pairs(df).collect()}
    for i in range(0, n, 2):
        assert (f"c{i:03d}", f"c{i:03d}::re") in pairs, i
    for a, b in pairs:
        assert a.split("::")[0] == b.split("::")[0], (a, b)


def test_fingerprint_clips_null_and_garbage_degrade(spark):
    """fp_ok=false (not a crash) for null bytes, null sr, unknown
    codec, garbage payload — the corrupt-rows-degrade contract."""
    from bdqc_spark.functions.audio_fingerprint import fingerprint_clips

    pcm, sr = _corpus_pcm(1)
    rows = [
        ("ok", audio.encode(pcm, "pcm_s16le"), sr, "pcm_s16le"),
        ("nullb", None, 16000, "pcm_s16le"),
        ("nullsr", audio.encode(pcm, "pcm_s16le"), None, "pcm_s16le"),
        ("badcodec", audio.encode(pcm, "pcm_s16le"), 16000, "mp3"),
        ("garbage", b"\x00" * 7, 16000, "wav"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, sr_hz int, codec string")
    out = {r.clip_id: r for r in fingerprint_clips(df).collect()}
    assert out["ok"].fp_ok and out["ok"].fp_frames > 0
    for k in ("nullb", "nullsr", "badcodec", "garbage"):
        assert not out[k].fp_ok, k
