"""Loudness normalization + silence trimming — the two standard
rewrite passes a speech training corpus runs before featurization.

- `clip_normalize`: BS.1770 gated-loudness gain normalization to a
  target LUFS (EBU R128 convention, default −23 LUFS) with a peak
  ceiling guard: if the required gain would push the sample peak past
  the ceiling the gain is reduced so the peak lands exactly on it
  ("normalize but never clip" — `limited=true` records the
  compromise). Pure linear gain — no dynamics processing, so the
  waveform shape (and every downstream spectral feature) is preserved
  up to a scalar.
- `clip_trim_silence`: strips leading/trailing non-speech using the
  SAME energy-gate VAD convention as the profile stage
  (functions/audio.py VAD_FRAME_MS/VAD_RMS_MIN, non-overlapping
  frames, frame energy vs thr²·w) so "what the profiler calls
  silence" and "what the trimmer removes" can never drift apart. A
  configurable pad keeps natural attack/decay around the speech.

Execution contract matches functions/augment.py: one mapInArrow pass
over (clip_id, bytes, sr_hz, codec, ...), bytes decoded zero-copy
from the Arrow buffers, rewritten payload re-encoded as pcm_s16le,
corrupt/undecodable rows degrade to ok=false with a null payload.
Only scalars ever shuffle. Reference parity: the reference's QC
pipeline profiles and flags (SURVEY.md §2 A6/A11); these are the
corresponding REPAIR passes a Spark-first pipeline adds so flagged
clips can be fixed in place rather than only dropped.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from bdqc_spark.functions.audio import VAD_FRAME_MS, VAD_RMS_MIN
from bdqc_spark.functions.loudness import integrated_lufs

TARGET_LUFS_DEFAULT = -23.0  # EBU R128 programme loudness target
PEAK_CEIL_DBFS = -1.0        # never push sample peak above this


def normalize_gain(
    pcm: np.ndarray, sr: int, target_lufs: float = TARGET_LUFS_DEFAULT
) -> tuple[np.ndarray, float, float, bool]:
    """→ (out_pcm, lufs_before, gain_db_applied, limited).

    Digital silence (integrated loudness −inf) passes through with
    zero gain — there is no loudness to normalize against."""
    lufs = integrated_lufs(pcm, sr)
    if not np.isfinite(lufs):
        return pcm, lufs, 0.0, False
    gain_db = target_lufs - lufs
    g = 10.0 ** (gain_db / 20.0)
    peak = float(np.max(np.abs(pcm), initial=0.0))
    ceil = 10.0 ** (PEAK_CEIL_DBFS / 20.0)
    limited = False
    if peak * g > ceil:
        g = ceil / peak
        gain_db = 20.0 * float(np.log10(g))
        limited = True
    return (pcm * np.float32(g)).astype(np.float32), lufs, gain_db, limited


def trim_silence(
    pcm: np.ndarray, sr: int, pad_ms: int = 100
) -> tuple[np.ndarray, int, int]:
    """→ (trimmed_pcm, lead_trim_ms, trail_trim_ms).

    Frames exactly like speech_ratio (non-overlapping VAD_FRAME_MS
    windows, energy ≥ thr²·w = active); trims everything before the
    first / after the last active frame, minus `pad_ms` of context.
    An all-silent clip returns empty (the caller decides whether
    that's a drop); a clip shorter than one frame passes through."""
    n = pcm.shape[0]
    if n == 0 or sr <= 0:
        return pcm, 0, 0
    w = max(int(sr * VAD_FRAME_MS) // 1000, 1)
    nf = n // w
    if nf == 0:
        return pcm, 0, 0
    x = pcm[: nf * w].reshape(nf, w)
    e = np.einsum("ij,ij->i", x, x, optimize=False)
    thr_e = np.float32(VAD_RMS_MIN * VAD_RMS_MIN * w)
    active = np.flatnonzero(e >= thr_e)
    if active.size == 0:
        return pcm[:0], int(round(n * 1000.0 / sr)), 0
    pad = int(sr * pad_ms) // 1000
    start = max(int(active[0]) * w - pad, 0)
    # the tail partial frame (< w samples) is never VAD-framed; keep it
    # only if the last full frame is active (it is that frame's decay)
    stop_frame_end = (int(active[-1]) + 1) * w
    stop = n if active[-1] == nf - 1 else min(stop_frame_end + pad, n)
    lead_ms = int(round(start * 1000.0 / sr))
    trail_ms = int(round((n - stop) * 1000.0 / sr))
    return pcm[start:stop], lead_ms, trail_ms


NORMALIZE_FIELDS = (
    "bytes binary, sr_hz int, codec string, norm_ok boolean, "
    "lufs_before double, lufs_after double, gain_db double, limited boolean"
)
TRIM_FIELDS = (
    "bytes binary, sr_hz int, codec string, trim_ok boolean, "
    "lead_trim_ms int, trail_trim_ms int, dur_ms_after int"
)


def _rewrite_arrow(mode: str, target_lufs: float, pad_ms: int):
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from bdqc_spark.functions.audio import CODECS, decode_arrow_slice, encode
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
            payload: list = [None] * n
            f1 = np.full(n, np.nan)  # lufs_before | lead_trim_ms
            f2 = np.full(n, np.nan)  # lufs_after  | trail_trim_ms
            f3 = np.full(n, np.nan)  # gain_db     | dur_ms_after
            flag = np.zeros(n, dtype=bool)  # limited (normalize only)
            for i in range(n):
                if nulls[i] or codec[i] not in CODECS or sr_null[i] or not (sr[i] > 0):
                    continue
                try:
                    pcm = decode_arrow_slice(
                        data, int(offsets[i]), int(offsets[i + 1]), codec[i]
                    )
                    if mode == "normalize":
                        out, lufs0, gain_db, limited = normalize_gain(
                            pcm, int(sr[i]), target_lufs
                        )
                        f1[i] = lufs0
                        f2[i] = integrated_lufs(out, int(sr[i]))
                        f3[i] = gain_db
                        flag[i] = limited
                    else:
                        out, lead, trail = trim_silence(pcm, int(sr[i]), pad_ms)
                        f1[i] = lead
                        f2[i] = trail
                        f3[i] = int(round(out.shape[0] * 1000.0 / sr[i]))
                except (ValueError, TypeError):
                    continue
                ok[i] = True
                payload[i] = encode(out, "pcm_s16le")

            passthrough = {
                name: batch.column(batch.schema.get_field_index(name))
                for name in batch.schema.names
                if name not in ("bytes", "sr_hz", "codec", "dur_ms")
            }
            base = {
                **passthrough,
                "bytes": pa.array(payload, pa.binary()),
                "sr_hz": pa.array(np.where(ok, sr, 0).astype(np.int32), pa.int32()),
                "codec": pa.array(["pcm_s16le" if o else None for o in ok], pa.string()),
            }
            if mode == "normalize":
                yield pa.RecordBatch.from_pydict(
                    {
                        **base,
                        "norm_ok": pa.array(ok),
                        "lufs_before": pa.array(f1, pa.float64()),
                        "lufs_after": pa.array(f2, pa.float64()),
                        "gain_db": pa.array(f3, pa.float64()),
                        "limited": pa.array(flag),
                    }
                )
            else:
                yield pa.RecordBatch.from_pydict(
                    {
                        **base,
                        "trim_ok": pa.array(ok),
                        "lead_trim_ms": pa.array(
                            np.nan_to_num(f1).astype(np.int32), pa.int32()
                        ),
                        "trail_trim_ms": pa.array(
                            np.nan_to_num(f2).astype(np.int32), pa.int32()
                        ),
                        "dur_ms_after": pa.array(
                            np.nan_to_num(f3).astype(np.int32), pa.int32()
                        ),
                    }
                )

    return run


def _out_schema(clips, fields: str) -> str:
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in clips.schema.fields
        if f.name not in ("bytes", "sr_hz", "codec", "dur_ms")
    )
    return f"{passthrough}, {fields}"


def clip_normalize(clips, target_lufs: float = TARGET_LUFS_DEFAULT):
    """clips(clip_id, bytes, sr_hz, codec, ...) → same rows with
    loudness-normalized pcm_s16le payloads + the gain audit trail."""
    return clips.mapInArrow(
        _rewrite_arrow("normalize", target_lufs, 0),
        _out_schema(clips, NORMALIZE_FIELDS),
    )


def clip_trim_silence(clips, pad_ms: int = 100):
    """clips(clip_id, bytes, sr_hz, codec, ...) → same rows with
    leading/trailing silence removed (VAD-gated, padded)."""
    return clips.mapInArrow(
        _rewrite_arrow("trim", 0.0, pad_ms),
        _out_schema(clips, TRIM_FIELDS),
    )
