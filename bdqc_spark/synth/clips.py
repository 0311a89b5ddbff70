"""Deterministic synthetic `clips` corpus (FIXTURES.md §1).

Every clip is generated from rng = default_rng([seed, i]) — a pure
function of (seed, clip index) — so generation is order-independent
and can run distributed (mapInPandas over a range) or single-node
(the oracle's pandas path) and produce IDENTICAL bytes. This is the
sandbox stand-in for the 10^12-clip Iceberg corpus sample
(BASELINE.json:2); skews (codec 80/10/5/5, lang 60/15/10/10/5)
deliberately exercise the salted-repartition path.

Anomaly classes (FIXTURES.md §1 A-F), disjoint by construction —
class drawn first, one per clip:
  A corrupt bytes        → audio.decode_failed
  B dur_ms cohort outlier→ robust_z.dur_ms
  C gibberish/empty text → text.high_ppl / text.empty
  D metadata mismatch    → audio.dur_mismatch / meta.sr_invalid
  E mixed-language text  → text.lang_conf_low (same scorer both sides)
  G lying WAV header     → audio.hdr_sr_mismatch (fmt-chunk rate ≠ sr_hz)
  H silence-padded clip  → audio.low_speech (speech burst ≤15% of clip)
  I transcript/audio pairing error → robust_z.log_cps (transcript
    ~25-50× too long, or a 1-word transcript on a 5-8 s clip — the
    cross-modal speech-rate rule; clean transcripts are length-
    correlated with clip duration via a 2.0-3.5 words/sec rate, so
    chars-per-speech-second is a tight per-cohort distribution)
  F = clean rows with PII/toxicity injected (keep=True, scrub edits>0)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from bdqc_spark.functions.audio import encode, encode_wav
from bdqc_spark.functions.langid import LANGS, LEXICONS, synth_sentence

CODECS_P = (
    ("pcm_s16le", 0.70),
    ("wav", 0.10),
    ("pcm_f32le", 0.10),
    ("ulaw", 0.05),
    ("alaw", 0.05),
)
# Inner sample encoding for WAV-container clips (format tags 1/3/6/7,
# 8- and 16-bit PCM) — exercises every wire-format branch.
WAV_INNER_P = (
    ("pcm_s16le", 0.50),
    ("pcm_u8", 0.15),
    ("pcm_f32le", 0.10),
    ("ulaw", 0.125),
    ("alaw", 0.125),
)
LANGS_P = (("en", 0.60), ("es", 0.15), ("de", 0.10), ("fr", 0.10), ("zh", 0.05))
SR_P = ((8000, 0.10), (16000, 0.70), (22050, 0.10), (44100, 0.10))

ANOMALY_P = 0.015  # per class A..E
PII_P = 0.06
TOX_P = 0.04

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, lang_true string, anomaly string"
)


def _choice(rng: np.random.Generator, pairs) -> object:
    vals, ps = zip(*pairs)
    return vals[int(rng.choice(len(vals), p=np.array(ps) / sum(ps)))]


def _synth_pcm(rng: np.random.Generator, sr: int, dur_ms: int) -> np.ndarray:
    n = max(int(sr * dur_ms / 1000), 1)
    t = np.arange(n) / sr
    k = int(rng.integers(1, 4))
    pcm = np.zeros(n)
    for _ in range(k):
        f = float(rng.uniform(100, min(3000, sr / 2 - 100)))
        a = float(rng.uniform(0.1, 0.8 / k))
        pcm += a * np.sin(2 * np.pi * f * t + float(rng.uniform(0, 2 * np.pi)))
    pcm += rng.normal(0, float(rng.uniform(0.005, 0.03)), size=n)
    return np.clip(pcm, -1.0, 1.0)


def _gen_one(seed: int, i: int) -> dict:
    rng = np.random.default_rng([seed, i])
    lang = _choice(rng, LANGS_P)
    codec = _choice(rng, CODECS_P)
    sr = int(_choice(rng, SR_P))
    # Tight-ish spread: keeps the clean-row robust-z tail well below
    # the z=6 rule threshold (SURVEY.md §7 risk 2 — thresholds placed
    # away from quantile noise), while anomaly class B sits at z≳30.
    dur_ms = int(np.clip(rng.lognormal(7.4, 0.25), 300, 8000))

    u = rng.random()
    anomaly = ""
    for cls, lo in (
        ("A", 0.0),
        ("B", 1.0),
        ("C", 2.0),
        ("D", 3.0),
        ("E", 4.0),
        ("G", 5.0),
        ("H", 6.0),
        ("I", 7.0),
    ):
        if lo * ANOMALY_P <= u < (lo + 1) * ANOMALY_P:
            anomaly = cls
    if anomaly == "G":
        # header lies are a container-only failure mode
        codec = "wav"
    elif anomaly == "H":
        # long enough that the audio.low_speech duration gate applies
        dur_ms = max(dur_ms, 2500)
    elif anomaly == "I":
        # long enough that the cross-modal cps rule has evidence
        # (rules.CPS_MIN_DUR_MS) and a 1-word transcript is extreme
        dur_ms = max(dur_ms, int(rng.uniform(5000, 8000)))
    if anomaly == "B":
        # Cohort outlier duration; keep sr low to bound payload size.
        sr = 8000
        dur_ms = int(rng.uniform(25000, 40000))

    # transcript — length correlated with clip duration like real
    # speech (a drawn speaking rate sets the word budget), so the
    # cross-modal chars-per-speech-second distribution is tight for
    # clean rows and class I can violate it in either direction
    rate_wps = float(rng.uniform(2.0, 3.5))
    n_words = max(2, int(round(dur_ms / 1000.0 * rate_wps)))
    if anomaly == "I":
        n_words = n_words * int(rng.integers(25, 50)) if rng.random() < 0.5 else 1
    chunks = []
    left = n_words
    while left > 0:
        k = int(min(left, rng.integers(6, 13)))
        chunks.append(synth_sentence(rng, lang, k))
        left -= k
    transcript = " ".join(chunks)
    if anomaly == "C":
        if rng.random() < 0.3:
            transcript = "   " if rng.random() < 0.5 else ""
        else:
            transcript = "".join(
                chr(int(c)) for c in rng.integers(33, 126, size=int(rng.integers(40, 120)))
            )
    elif anomaly == "E":
        other = LANGS[(LANGS.index(lang) + 1 + int(rng.integers(0, 4))) % len(LANGS)]
        w1 = synth_sentence(rng, lang, 8).split()
        w2 = synth_sentence(rng, other, 8).split()
        mixed = [w for pair in zip(w1, w2) for w in pair]
        transcript = " ".join(mixed)
    else:
        if rng.random() < PII_P:
            kind = int(rng.integers(0, 4))
            name = LEXICONS["en"][int(rng.integers(0, 40))]
            pii = (
                f"contact {name}{int(rng.integers(10,99))}@example.com",
                f"call {int(rng.integers(200,999))}-{int(rng.integers(200,999))}-{int(rng.integers(1000,9999))}",
                f"ssn {int(rng.integers(100,999))}-{int(rng.integers(10,99))}-{int(rng.integers(1000,9999))}",
                f"ip {int(rng.integers(1,255))}.{int(rng.integers(0,255))}.{int(rng.integers(0,255))}.{int(rng.integers(1,255))}",
            )[kind]
            transcript = f"{transcript} {pii}"
        if rng.random() < TOX_P:
            tox = ("frak", "gorram", "smeg", "belgium")[int(rng.integers(0, 4))]
            words = transcript.split()
            pos = int(rng.integers(0, max(len(words), 1)))
            words.insert(pos, tox)
            transcript = " ".join(words)

    pcm = _synth_pcm(rng, sr, dur_ms)
    if anomaly == "H":
        # Silence-pad: keep one short speech burst (5-15% of the
        # clip), flat-line the rest at a level far under the VAD
        # frame gate yet loud enough globally to dodge audio.silent.
        f = float(rng.uniform(0.05, 0.15))
        n = len(pcm)
        keep_n = max(int(n * f), 1)
        at = int(rng.integers(0, n - keep_n + 1))
        quiet = rng.normal(0.0, 2e-4, size=n)
        quiet[at : at + keep_n] = pcm[at : at + keep_n]
        pcm = np.clip(quiet, -1.0, 1.0)
    if codec == "wav":
        inner = _choice(rng, WAV_INNER_P)
        channels = 2 if rng.random() < 0.2 else 1
        hdr_sr = sr * 2 if anomaly == "G" else None
        raw = encode_wav(pcm, sr, inner=inner, channels=channels, hdr_sr=hdr_sr)
    else:
        raw = encode(pcm, codec)

    if anomaly == "A":
        # Corrupt payload: empty or odd-length truncation.
        # odd-length prefix → fails the %2 (s16) and %4 (f32) checks
        raw = b"" if rng.random() < 0.5 else raw[: (max(len(raw) // 3, 2) | 1)]
        if codec in ("ulaw", "alaw"):
            raw = b""  # any byte string decodes under G.711 → force failure
    elif anomaly == "D":
        if rng.random() < 0.5:
            dur_ms = int(dur_ms * 2 + 500)  # lies about duration
        else:
            sr = 12345  # implausible sample rate

    return {
        "clip_id": f"clip-{i:012d}",
        "bytes": raw,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript,
        "lang_true": lang,
        "anomaly": anomaly,
    }


def generate_clips_pandas(n: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    rows = [_gen_one(seed, i) for i in range(start, start + n)]
    return pd.DataFrame(rows)


def generate_clips_df(
    spark, n: int, seed: int = 42, include_labels: bool = False, start: int = 0
):
    """Distributed generation: spark.range(start, start+n) →
    mapInPandas(_gen_one). Deterministic regardless of partitioning
    (per-index rng); `start` lets incremental appends extend a corpus
    with disjoint clip_ids."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([_gen_one(seed, int(i)) for i in b["id"]])

    df = spark.range(start, start + n).repartition(
        max(spark.sparkContext.defaultParallelism, 8)
    ).mapInPandas(gen, CLIPS_SCHEMA)
    if not include_labels:
        df = df.drop("lang_true", "anomaly")
    return df
