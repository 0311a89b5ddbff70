"""Within-clip loop detection (repeated/tiled audio).

A corpus tell with two common causes: augmentation pipelines that
tile a short recording to hit a duration target, and stuck recorders
re-emitting a buffer. Whole-corpus dedup never sees it (the clip is
unique); alignment (functions/align.py) only compares ACROSS clips.
Here: the clip's own 20 ms RMS energy envelope is autocorrelated at
lags >= LOOP_MIN_LAG_S, after mean removal and per-lag unbiased
normalization — a clip tiled with period T shows a sharp ACF peak at
lag T (and multiples), while natural speech's envelope decorrelates
within a few hundred ms (syllabic rhythm is quasi-periodic near
~250 ms, which is WHY the search floor sits at 1 s).

No-evidence conventions (pytest-gated): clips shorter than
2×LOOP_MIN_LAG_S of envelope, silent clips, and near-constant
envelopes (variance floor — a steady tone is "periodic" at every lag
and carries no loop information) report ``loop_ok=false``.

Execution contract: one ``mapInArrow`` pass (FFT-based ACF,
O(n log n) in envelope frames, i.e. ~50 values/sec of audio), only
scalars shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

LOOP_FRAME_MS = 20
LOOP_MIN_LAG_S = 1.0
LOOP_SCORE_MIN = 0.6
# evidence floor: envelope coefficient of variation (std/mean). A
# steady tone's envelope is flat except for window-boundary ripple —
# tiny but perfectly periodic, so an absolute variance floor is not
# enough (measured: 440 Hz tone reads ACF 1.0 with var ~1e-8). Speech
# envelopes read CV ~0.5-1.5; the floor is two decades below that.
LOOP_CV_MIN = 0.05
_VAR_FLOOR = 1e-10
_RMS_SILENT = 1e-4


def loop_stats(pcm: np.ndarray, sr: int) -> dict | None:
    """{'loop_score', 'loop_lag_ms', 'looped'} or None (too short /
    silent / flat envelope)."""
    n = pcm.shape[0]
    if n == 0 or sr <= 0:
        return None
    w = max(int(sr * LOOP_FRAME_MS) // 1000, 1)
    nf = n // w
    fps = 1000.0 / LOOP_FRAME_MS  # envelope frames per second
    min_lag = int(LOOP_MIN_LAG_S * fps)
    if nf < 2 * min_lag:
        return None
    x = pcm[: nf * w].reshape(nf, w).astype(np.float64)
    rms = np.sqrt(np.einsum("ij,ij->i", x, x) / w)
    if float(rms.max()) < _RMS_SILENT:
        return None
    e = rms - rms.mean()
    var = float(np.dot(e, e) / nf)
    if var < _VAR_FLOOR or np.sqrt(var) < LOOP_CV_MIN * float(rms.mean()):
        return None  # flat envelope: no loop information
    # FFT autocorrelation, unbiased per-lag normalization
    m = 1 << (2 * nf - 1).bit_length()
    spec = np.fft.rfft(e, m)
    ac = np.fft.irfft(spec * np.conj(spec), m)[:nf]
    lags = np.arange(nf)
    denom = (nf - lags) * var
    acf = ac / np.maximum(denom, _VAR_FLOOR)
    hi = nf // 2  # beyond half the clip the estimate is too noisy
    if hi <= min_lag:
        return None
    band = acf[min_lag:hi]
    k = int(np.argmax(band))
    score = float(np.clip(band[k], -1.0, 1.0))
    lag_ms = (min_lag + k) * LOOP_FRAME_MS
    return {
        "loop_score": score,
        "loop_lag_ms": int(lag_ms),
        "looped": bool(score > LOOP_SCORE_MIN),
    }


_LOOP_FIELDS = "loop_ok boolean, loop_score double, loop_lag_ms int, looped boolean"


def _loop_arrow(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
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
        score = np.full(n, np.nan)
        lag = np.zeros(n, dtype=np.int32)
        looped = np.zeros(n, dtype=bool)
        for i in range(n):
            if nulls[i] or codec[i] not in CODECS or sr_null[i] or not (sr[i] > 0):
                continue
            try:
                pcm = decode_arrow_slice(data, int(offsets[i]), int(offsets[i + 1]), codec[i])
                st = loop_stats(pcm, int(sr[i]))
            except (ValueError, TypeError):
                continue
            if st is None:
                continue
            ok[i] = True
            score[i], lag[i], looped[i] = st["loop_score"], st["loop_lag_ms"], st["looped"]
        passthrough = {
            name: batch.column(batch.schema.get_field_index(name))
            for name in batch.schema.names
            if name != "bytes"
        }
        yield pa.RecordBatch.from_pydict(
            {
                **passthrough,
                "loop_ok": pa.array(ok),
                "loop_score": pa.array(score),
                "loop_lag_ms": pa.array(lag, type=pa.int32()),
                "looped": pa.array(looped),
            }
        )


def clip_loops(clips):
    """clips(bytes, codec, sr_hz, …) → per-clip loop signals. Same
    execution contract as the profile stage (module docstring)."""
    keep = [f for f in clips.schema.fieldNames() if f != "bytes"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in clips.schema if f.name != "bytes"
    )
    return clips.mapInArrow(_loop_arrow, f"{out_schema}, {_LOOP_FIELDS}").select(
        *keep, "loop_ok", "loop_score", "loop_lag_ms", "looped"
    )
