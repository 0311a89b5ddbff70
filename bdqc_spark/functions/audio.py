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

AUDIO_PROFILE_SCHEMA = (
    "pcm_ok boolean, n_samples int, dur_ms_decoded int, rms double, "
    "peak double, clip_rate double, dc_off double"
)


# --------------------------------------------------------------------------
# Wire-format ITU-T G.711 µ-law / A-law, as 256-entry decode LUTs and
# 64K-entry encode LUTs (one gather per sample, no transcendental math).
#
# Byte layout per the standard (and the classic Sun Microsystems g711.c
# that every interop stack ships): sign | 3-bit segment | 4-bit mantissa,
# µ-law with bias 0x84 and full bit complement on the wire, A-law with
# even-bit inversion (XOR 0x55). Built from the segmented-companding
# definition below; tests cross-check every entry of all four tables
# against CPython's `audioop` (which embeds the Sun/ITU tables).
# --------------------------------------------------------------------------
_U_SEG_END = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_A_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def _build_ulaw_dec() -> np.ndarray:
    u = np.arange(256, dtype=np.int32) ^ 0xFF          # wire complement
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _build_alaw_dec() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55          # even-bit inversion
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _build_ulaw_enc() -> np.ndarray:
    """uint8 code for every int16 sample, indexed by sample.view(uint16)."""
    x = np.arange(-32768, 32768, dtype=np.int32) >> 2  # 14-bit domain
    mask = np.where(x < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(x), 8159) + 33             # bias = 0x84 >> 2
    seg = np.searchsorted(_U_SEG_END, mag, side="left")
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    code = np.where(seg >= 8, 0x7F, uval) ^ mask
    # index by the uint16 bit pattern of the sample (two's complement)
    out = np.empty(65536, dtype=np.uint8)
    out[np.arange(-32768, 32768).astype(np.int16).view(np.uint16)] = code.astype(np.uint8)
    return out


def _build_alaw_enc() -> np.ndarray:
    x = np.arange(-32768, 32768, dtype=np.int32) >> 3  # 13-bit domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x < 0, -x - 1, x)
    seg = np.searchsorted(_A_SEG_END, mag, side="left")
    shift = np.where(seg < 2, 1, np.minimum(seg, 7))
    aval = (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F)
    code = np.where(seg >= 8, 0x7F, aval) ^ mask
    out = np.empty(65536, dtype=np.uint8)
    out[np.arange(-32768, 32768).astype(np.int16).view(np.uint16)] = code.astype(np.uint8)
    return out


_ULAW_DEC = _build_ulaw_dec()
_ALAW_DEC = _build_alaw_dec()
_ULAW_ENC = _build_ulaw_enc()
_ALAW_ENC = _build_alaw_enc()
# float32 decode tables: one gather straight to [-1, 1] PCM (hot path)
_ULAW_DEC_F32 = (_ULAW_DEC.astype(np.float32) / np.float32(32768.0))
_ALAW_DEC_F32 = (_ALAW_DEC.astype(np.float32) / np.float32(32768.0))


def _to_i16(pcm: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


# --------------------------------------------------------------------------
# Encoders (used by the synthetic generator) — float32 PCM in [-1, 1] → bytes
# --------------------------------------------------------------------------
def encode(pcm: np.ndarray, codec: str) -> bytes:
    if codec == "pcm_s16le":
        x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
        return (np.round(x * 32767.0).astype("<i2")).tobytes()
    if codec == "pcm_f32le":
        x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
        return x.astype("<f4").tobytes()
    if codec == "ulaw":
        return _ULAW_ENC[_to_i16(pcm).view(np.uint16)].tobytes()
    if codec == "alaw":
        return _ALAW_ENC[_to_i16(pcm).view(np.uint16)].tobytes()
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
        return _ULAW_DEC_F32[np.frombuffer(raw, dtype=np.uint8)]
    if codec == "alaw":
        if len(raw) == 0:
            raise ValueError("empty alaw payload")
        return _ALAW_DEC_F32[np.frombuffer(raw, dtype=np.uint8)]
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
        return _ULAW_DEC_F32[data[start:end]]
    if codec == "alaw":
        if n == 0:
            raise ValueError("empty alaw payload")
        return _ALAW_DEC_F32[data[start:end]]
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
