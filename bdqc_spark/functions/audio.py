"""From-scratch numpy audio codecs + vectorized decode/profile UDFs.

bdqc's Binary signature (lib/BDQC/FileSignature/Binary.pm,
reconstructed — SURVEY.md A6) profiles opaque binary files; here the
binary column is *decodable* audio, so the profile is computed on
the decoded PCM: validity, duration, RMS/peak, clipping rate, DC
offset. Codecs implemented from public definitions (ITU-T G.711
µ-law/A-law companding, PCM s16/f32 LE); no external audio libs
exist in this sandbox (SURVEY.md §0).

All decoding is vectorized numpy inside Arrow-batched pandas UDFs —
per-batch Python dispatch, per-row work stays in C (input_hint:
"no per-row Python").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CODECS = ("pcm_s16le", "pcm_f32le", "ulaw", "alaw")

_MU = 255.0
_A = 87.6
_LN_A = 1.0 + np.log(_A)

AUDIO_PROFILE_SCHEMA = (
    "pcm_ok boolean, n_samples int, dur_ms_decoded int, rms double, "
    "peak double, clip_rate double, dc_off double"
)


# --------------------------------------------------------------------------
# Encoders (used by the synthetic generator) — float32 PCM in [-1, 1] → bytes
# --------------------------------------------------------------------------
def encode(pcm: np.ndarray, codec: str) -> bytes:
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    if codec == "pcm_s16le":
        return (np.round(x * 32767.0).astype("<i2")).tobytes()
    if codec == "pcm_f32le":
        return x.astype("<f4").tobytes()
    if codec == "ulaw":
        # Continuous µ-law compand, quantized to 8-bit signed magnitude.
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        q = np.round(y * 127.0).astype(np.int8)
        return q.tobytes()
    if codec == "alaw":
        ax = np.abs(x)
        y = np.where(ax < 1.0 / _A, _A * ax / _LN_A, (1.0 + np.log(_A * np.maximum(ax, 1e-12))) / _LN_A)
        q = np.round(np.sign(x) * y * 127.0).astype(np.int8)
        return q.tobytes()
    raise ValueError(f"unknown codec {codec!r}")


# --------------------------------------------------------------------------
# Decoders — bytes → float32 PCM in [-1, 1]; raise on malformed payloads.
# float32 on purpose: source precision is ≤16 bits, and the decode
# path is memory-bandwidth-bound at scale — float64 doubles the
# traffic for zero fidelity gain (stats are accumulated in float64).
# --------------------------------------------------------------------------
def decode(raw: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        if len(raw) == 0 or len(raw) % 2 != 0:
            raise ValueError("pcm_s16le payload not a multiple of 2 bytes")
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / np.float32(32767.0)
    if codec == "pcm_f32le":
        if len(raw) == 0 or len(raw) % 4 != 0:
            raise ValueError("pcm_f32le payload not a multiple of 4 bytes")
        x = np.frombuffer(raw, dtype="<f4")
        if not np.all(np.isfinite(x)) or np.max(np.abs(x), initial=0.0) > 4.0:
            raise ValueError("pcm_f32le payload out of range / non-finite")
        return x
    if codec == "ulaw":
        if len(raw) == 0:
            raise ValueError("empty ulaw payload")
        y = np.frombuffer(raw, dtype=np.int8).astype(np.float32) / np.float32(127.0)
        return (np.sign(y) * np.expm1(np.abs(y) * np.float32(np.log1p(_MU))) / np.float32(_MU)).astype(
            np.float32
        )
    if codec == "alaw":
        if len(raw) == 0:
            raise ValueError("empty alaw payload")
        y = np.frombuffer(raw, dtype=np.int8).astype(np.float32) / np.float32(127.0)
        ay = np.abs(y)
        mag = np.where(
            ay < 1.0 / _LN_A,
            ay * np.float32(_LN_A / _A),
            np.exp(ay * np.float32(_LN_A) - np.float32(1.0)) / np.float32(_A),
        )
        return (np.sign(y) * mag).astype(np.float32)
    raise ValueError(f"unknown codec {codec!r}")


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    """Signal-to-noise ratio of est vs reference PCM, in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    est = np.asarray(est, dtype=np.float64)
    if ref.shape != est.shape:
        return float("-inf")
    noise = np.sum((ref - est) ** 2)
    sig = np.sum(ref**2)
    if noise == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return float(10.0 * np.log10(sig / noise))


# --------------------------------------------------------------------------
# Zero-copy decode of one Arrow binary column position (no PyBytes)
# --------------------------------------------------------------------------
def decode_arrow_slice(data: np.ndarray, start: int, end: int, codec: str) -> np.ndarray:
    """Decode payload bytes living at data[start:end] of an Arrow
    binary array's value buffer — numpy views, never a bytes copy
    (numpy handles unaligned views). Semantics identical to decode()."""
    n = end - start
    if codec == "pcm_s16le":
        if n == 0 or n % 2 != 0:
            raise ValueError("pcm_s16le payload not a multiple of 2 bytes")
        return data[start:end].view("<i2").astype(np.float32) / np.float32(32767.0)
    if codec == "pcm_f32le":
        if n == 0 or n % 4 != 0:
            raise ValueError("pcm_f32le payload not a multiple of 4 bytes")
        x = data[start:end].view("<f4")
        if not np.all(np.isfinite(x)) or np.max(np.abs(x), initial=0.0) > 4.0:
            raise ValueError("pcm_f32le payload out of range / non-finite")
        return x
    if codec == "ulaw":
        if n == 0:
            raise ValueError("empty ulaw payload")
        y = data[start:end].view(np.int8).astype(np.float32) / np.float32(127.0)
        return (np.sign(y) * np.expm1(np.abs(y) * np.float32(np.log1p(_MU))) / np.float32(_MU)).astype(
            np.float32
        )
    if codec == "alaw":
        if n == 0:
            raise ValueError("empty alaw payload")
        y = data[start:end].view(np.int8).astype(np.float32) / np.float32(127.0)
        ay = np.abs(y)
        mag = np.where(
            ay < 1.0 / _LN_A,
            ay * np.float32(_LN_A / _A),
            np.exp(ay * np.float32(_LN_A) - np.float32(1.0)) / np.float32(_A),
        )
        return (np.sign(y) * mag).astype(np.float32)
    raise ValueError(f"unknown codec {codec!r}")


# --------------------------------------------------------------------------
# Vectorized profile: one Arrow batch of (bytes, codec) → audio stats frame
# --------------------------------------------------------------------------
def profile_batch(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
    """Decode a batch and compute per-clip audio signature.

    Batch-level vectorization strategy: group the batch by codec and
    decode each group's payloads; per-clip stats are tiny reductions
    on the decoded arrays. (Clip payloads are variable-length, so the
    decode itself is per-clip numpy — still C-speed per element; only
    the ~256-row batch loop is Python.)
    """
    n = len(raw)
    out = {
        "pcm_ok": np.zeros(n, dtype=bool),
        "n_samples": np.zeros(n, dtype=np.int32),
        "dur_ms_decoded": np.zeros(n, dtype=np.int32),
        "rms": np.zeros(n, dtype=np.float64),
        "peak": np.zeros(n, dtype=np.float64),
        "clip_rate": np.zeros(n, dtype=np.float64),
        "dc_off": np.zeros(n, dtype=np.float64),
    }
    raw_v = raw.to_numpy(dtype=object)
    codec_v = codec.to_numpy(dtype=object)
    sr_v = pd.to_numeric(sr_hz, errors="coerce").fillna(0).to_numpy()
    for i in range(n):
        b, cd, sr = raw_v[i], codec_v[i], sr_v[i]
        if b is None or cd not in CODECS or not sr or sr <= 0:
            continue
        try:
            pcm = decode(bytes(b), cd)
        except (ValueError, TypeError):
            continue
        ns = pcm.shape[0]
        out["pcm_ok"][i] = True
        out["n_samples"][i] = ns
        out["dur_ms_decoded"][i] = int(round(ns * 1000.0 / sr))
        # float32 element ops, float64 accumulators (accuracy where it
        # matters, half the memory traffic where it doesn't)
        apcm = np.abs(pcm)
        out["rms"][i] = float(np.sqrt(np.mean(np.square(pcm), dtype=np.float64))) if ns else 0.0
        out["peak"][i] = float(np.max(apcm)) if ns else 0.0
        out["clip_rate"][i] = float(np.mean(apcm >= 0.999, dtype=np.float64)) if ns else 0.0
        out["dc_off"][i] = float(np.mean(pcm, dtype=np.float64)) if ns else 0.0
    return pd.DataFrame(out)
