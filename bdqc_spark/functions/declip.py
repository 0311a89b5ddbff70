"""Declipping: reconstruct rail-clipped samples by cubic interpolation.

The mechanical repair for ``audio.clipping``: samples flattened
against the int16 rails lose the waveform's extrema, but the clean
samples on either side of each clipped run constrain them tightly —
a cubic Hermite arc through the boundary points with the boundary
slopes recovers the missing lobe (the classic interpolation declip;
the same idea behind Janssen-style AR interpolation, simplified to
the cubic case that needs no model fit).

Contract:
- Only INTERIOR runs with two clean samples on each side are
  reconstructed (edge runs have no right/left constraint — left
  as-is, counted in ``n_skipped``).
- Reconstruction may (correctly) exceed the rails; if the repaired
  waveform's peak lands above RAIL the whole clip is rescaled to
  PEAK_OUT — declipping implies the original gain was too hot, and
  the normalize pass downstream re-gains to target loudness anyway.
- A fully-railed clip (no clean anchor samples) returns unchanged
  with ``ok=False`` — nothing to anchor a reconstruction.

Used by plans/repair.py as the ``declip`` pass (rule
``audio.clipping`` → repairable); also callable standalone.
"""

from __future__ import annotations

import numpy as np

RAIL = 0.999  # same convention as plans/profile.py clip_rate
PEAK_OUT = 0.98


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """[start, end] (inclusive) index pairs of True runs."""
    if not mask.any():
        return []
    d = np.diff(mask.astype(np.int8))
    starts = list(np.where(d == 1)[0] + 1)
    ends = list(np.where(d == -1)[0])
    if mask[0]:
        starts.insert(0, 0)
    if mask[-1]:
        ends.append(mask.shape[0] - 1)
    return list(zip(starts, ends))


def declip(pcm: np.ndarray) -> tuple[np.ndarray, dict]:
    """→ (repaired float32 pcm, {'ok', 'n_fixed', 'n_skipped'})."""
    x = pcm.astype(np.float64, copy=True)
    n = x.shape[0]
    clipped = np.abs(x) >= RAIL
    runs = _runs(clipped)
    if not runs:
        return pcm.astype(np.float32, copy=False), {"ok": True, "n_fixed": 0, "n_skipped": 0}
    n_fixed = n_skipped = 0
    for s, e in runs:
        if s < 2 or e > n - 3:
            n_skipped += 1
            continue
        p0, p1 = x[s - 1], x[e + 1]
        m0 = x[s - 1] - x[s - 2]  # one-sided slopes at the anchors
        m1 = x[e + 2] - x[e + 1]
        ln = e - s + 1
        # Hermite basis over t in (0,1), scaled to the gap length + 1
        t = np.arange(1, ln + 1, dtype=np.float64) / (ln + 1)
        h00 = 2 * t**3 - 3 * t**2 + 1
        h10 = t**3 - 2 * t**2 + t
        h01 = -2 * t**3 + 3 * t**2
        h11 = t**3 - t**2
        span = float(ln + 1)
        x[s : e + 1] = h00 * p0 + h10 * m0 * span + h01 * p1 + h11 * m1 * span
        n_fixed += 1
    if n_fixed == 0:
        return pcm.astype(np.float32, copy=False), {
            "ok": False,
            "n_fixed": 0,
            "n_skipped": n_skipped,
        }
    peak = float(np.abs(x).max())
    if peak > RAIL:
        x *= PEAK_OUT / peak
    return x.astype(np.float32), {"ok": True, "n_fixed": n_fixed, "n_skipped": n_skipped}
