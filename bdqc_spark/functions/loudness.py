"""ITU-R BS.1770-style integrated loudness (LUFS) per clip.

Public algorithm (ITU-R BS.1770-4): K-weighting (stage 1 high shelf
+ stage 2 RLB high-pass) → mean square over 400 ms blocks at 75%
overlap → −70 LUFS absolute gate → −10 LU relative gate → integrated
loudness −0.691 + 10·log10(gated mean square).

Implementation notes (Spark/numpy-first, no scipy in the sandbox):
- Biquad coefficients are DERIVED per sample rate from the published
  analog prototype (high shelf f0≈1681.97 Hz, G≈+3.99984 dB,
  Q≈0.70718; high-pass f0≈38.1355 Hz, Q≈0.50033) via the standard
  RBJ bilinear-transform formulas; at 48 kHz the derivation
  reproduces the coefficient table printed in BS.1770 itself to
  ~1e-6 (pytest-gated) — the independent wire check.
- The K-weighting IIR is applied in the FREQUENCY domain: one padded
  rFFT per clip, multiply by the cascade's complex response
  evaluated on the bin frequencies, irFFT back. With ≥1 s of zero
  padding the circular-aliasing error of the filter tail is far
  below the 0.1 LU test tolerance, and the whole clip vectorizes as
  one transform instead of a per-sample Python IIR loop.
- Block energies come from one cumsum over the squared filtered
  signal — gating is pure numpy on the block vector.

This is a *measurement* operator (QC signals: too-quiet / too-hot /
over-compressed clips), not a sample-exact codec path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

# analog prototype constants (public derivation of the BS.1770 filter)
_SHELF_F0 = 1681.974450955533
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773

ABS_GATE_LUFS = -70.0
REL_GATE_LU = -10.0
BLOCK_SEC = 0.4
HOP_SEC = 0.1
_OFFSET = -0.691


_SHELF_VB_EXP = 0.4996667741545416


def k_filter_coeffs(sr: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """((b1, a1), (b2, a2)) biquad coefficients for sample rate sr.
    Stage 1: the ITU pre-filter via the De Man bilinear shelf
    formulation (Vh/Vb form — 'Evaluation of Implementations of the
    ITU-R BS.1770 Loudness Algorithm', AES 2013/14, a public
    derivation that reproduces the BS.1770 48 kHz table exactly);
    stage 2: RLB high-pass with the ITU's unnormalized numerator
    [1, -2, 1]."""
    K = np.tan(np.pi * _SHELF_F0 / sr)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh**_SHELF_VB_EXP
    a0 = 1.0 + K / _SHELF_Q + K * K
    b1 = np.array(
        [
            (Vh + Vb * K / _SHELF_Q + K * K) / a0,
            2.0 * (K * K - Vh) / a0,
            (Vh - Vb * K / _SHELF_Q + K * K) / a0,
        ]
    )
    a1 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _SHELF_Q + K * K) / a0])

    w0 = 2.0 * np.pi * _HP_F0 / sr
    cw, sw = np.cos(w0), np.sin(w0)
    alpha = sw / (2.0 * _HP_Q)
    ha0 = 1.0 + alpha
    b2 = np.array([1.0, -2.0, 1.0])
    a2 = np.array([ha0, -2.0 * cw, 1.0 - alpha]) / ha0
    return b1, a1, b2, a2


def _cascade_response(freqs: np.ndarray, sr: int) -> np.ndarray:
    """Complex response of the two-stage K-weighting cascade at the
    given frequencies (Hz)."""
    b1, a1, b2, a2 = k_filter_coeffs(sr)
    z = np.exp(-2j * np.pi * freqs / sr)
    z2 = z * z

    def h(b, a):
        return (b[0] + b[1] * z + b[2] * z2) / (a[0] + a[1] * z + a[2] * z2)

    return h(b1, a1) * h(b2, a2)


def k_weighted(pcm: np.ndarray, sr: int) -> np.ndarray:
    """K-weighted signal via padded frequency-domain filtering."""
    x = np.asarray(pcm, dtype=np.float64)
    n = x.shape[0]
    nfft = 1 << int(np.ceil(np.log2(max(n + sr, 16))))
    X = np.fft.rfft(x, nfft)
    H = _cascade_response(np.fft.rfftfreq(nfft, 1.0 / sr), sr)
    return np.fft.irfft(X * H, nfft)[:n]


def integrated_lufs(pcm: np.ndarray, sr: int) -> float:
    """Gated integrated loudness in LUFS; -inf for digital silence.
    Clips shorter than one 400 ms block are measured as a single
    (shorter) block — BS.1770 leaves this case undefined."""
    if len(pcm) == 0 or sr <= 0:
        return float("-inf")
    y = k_weighted(pcm, sr)
    block = min(int(BLOCK_SEC * sr), len(y))
    hop = max(int(HOP_SEC * sr), 1)
    e = np.concatenate([[0.0], np.cumsum(y * y)])
    starts = np.arange(0, len(y) - block + 1, hop)
    ms = (e[starts + block] - e[starts]) / block
    with np.errstate(divide="ignore"):
        lj = _OFFSET + 10.0 * np.log10(ms)
    keep = lj > ABS_GATE_LUFS
    if not keep.any():
        return float("-inf")
    rel = _OFFSET + 10.0 * np.log10(ms[keep].mean()) + REL_GATE_LU
    keep &= lj > rel
    if not keep.any():
        return float("-inf")
    return float(_OFFSET + 10.0 * np.log10(ms[keep].mean()))


def loudness_stats(pcm: np.ndarray, sr: int) -> dict:
    """Per-clip loudness QC signals: integrated LUFS, sample peak in
    dBFS, and crest factor (peak dB − RMS dB, low ⇒ over-compressed/
    clipped, high ⇒ spiky/transient)."""
    peak = float(np.max(np.abs(pcm), initial=0.0))
    rms = float(np.sqrt(np.mean(np.square(pcm), dtype=np.float64))) if len(pcm) else 0.0
    peak_db = 20.0 * np.log10(peak) if peak > 0 else float("-inf")
    crest = (peak_db - 20.0 * np.log10(rms)) if (peak > 0 and rms > 0) else float("nan")
    return {
        "lufs": integrated_lufs(pcm, sr),
        "peak_dbfs": peak_db,
        "crest_db": crest,
    }


_LOUDNESS_FIELDS = "loud_ok boolean, lufs double, peak_dbfs double, crest_db double"


def _loudness_arrow(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from bdqc_spark.functions.audio import CODECS, decode_arrow_slice
    from bdqc_spark.plans.profile import _binary_buffers

    for batch in batches:
        n = batch.num_rows
        barr = batch.column(batch.schema.get_field_index("bytes"))
        offsets, data = _binary_buffers(barr)
        nulls = pa.compute.is_null(barr).to_numpy(zero_copy_only=False)
        codec = batch.column(batch.schema.get_field_index("codec")).to_pylist()
        sr_arr = batch.column(batch.schema.get_field_index("sr_hz"))
        sr_null = pa.compute.is_null(sr_arr).to_numpy(zero_copy_only=False)
        sr = sr_arr.to_numpy(zero_copy_only=False)

        ok = np.zeros(n, dtype=bool)
        lufs = np.full(n, -np.inf)
        peak = np.full(n, -np.inf)
        crest = np.full(n, np.nan)
        for i in range(n):
            if nulls[i] or codec[i] not in CODECS or sr_null[i] or not (sr[i] > 0):
                continue
            try:
                pcm = decode_arrow_slice(data, int(offsets[i]), int(offsets[i + 1]), codec[i])
            except (ValueError, TypeError):
                continue
            st = loudness_stats(pcm, int(sr[i]))
            ok[i] = True
            lufs[i], peak[i], crest[i] = st["lufs"], st["peak_dbfs"], st["crest_db"]
        passthrough = {
            name: batch.column(batch.schema.get_field_index(name))
            for name in batch.schema.names
            if name != "bytes"
        }
        yield pa.RecordBatch.from_pydict(
            {
                **passthrough,
                "loud_ok": pa.array(ok),
                "lufs": pa.array(lufs),
                "peak_dbfs": pa.array(peak),
                "crest_db": pa.array(crest),
            }
        )


def clip_loudness(clips):
    """clips(bytes, codec, sr_hz, …) → per-clip loudness signals.
    Same execution contract as the profile stage: one mapInArrow
    pass over the scan, zero-copy Arrow buffers, `bytes` never
    leaves the stage."""
    from pyspark.sql import functions as F  # noqa: F401

    keep = [f for f in clips.schema.fieldNames() if f != "bytes"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in clips.schema if f.name != "bytes"
    )
    return clips.mapInArrow(
        _loudness_arrow, f"{out_schema}, {_LOUDNESS_FIELDS}"
    ).select(*keep, "loud_ok", "lufs", "peak_dbfs", "crest_db")
