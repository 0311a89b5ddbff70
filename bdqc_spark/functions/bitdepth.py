"""Per-clip effective bit-depth estimation (requantization QC).

A catalog says ``pcm_s16le``, but was the source really 16-bit?
8-bit material upscaled to 16 (a common lossy-ancestry tell in
scraped audio) lands every sample on a coarse grid: ``x << 8`` makes
every value a multiple of 256, and the replicate conversion
``x * 257`` a multiple of 257. The GCD of the nonzero sample values
exposes both — for genuinely 16-bit content (noise floor, dither)
the GCD collapses to 1 after a handful of samples, so false
positives are ~2^-n in the sample count.

Reported: ``value_gcd``, ``effective_bits`` = round(16 - log2(gcd))
(the bit width of the implied grid), and ``requantized`` =
effective_bits <= REQUANT_BITS_MAX. Honest scope, documented:

- Only the ``pcm_s16le`` wire format carries the raw int16 grid this
  analysis needs; companded codecs (u/A-law are 8-bit wire with a
  14/13-bit decode grid BY DESIGN) and float payloads have no hidden
  16-bit grid to test — they report ``bd_ok=false`` (no evidence),
  never a fake verdict.
- Dithered upconversions randomize the low bits and are invisible to
  a grid test (any detector would need noise-floor spectral
  analysis); this op detects the undithered shift/replicate paths,
  which are what bulk transcode pipelines emit.

Execution contract is the profile/snr one: one ``mapInArrow`` pass,
zero-copy int16 views over the Arrow buffer, only scalars shuffle.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa

BD_MIN_SAMPLES = 512  # gcd false-positive odds ~2^-512 on real noise
REQUANT_BITS_MAX = 12


def bitdepth_stats(ints: np.ndarray) -> dict | None:
    """{'value_gcd', 'effective_bits', 'requantized'} from int16
    samples, or None (too few samples / digital silence)."""
    if ints.shape[0] < BD_MIN_SAMPLES:
        return None
    nz = ints[ints != 0].astype(np.int32)
    if nz.shape[0] < BD_MIN_SAMPLES // 2:
        return None  # (near-)silence: no grid evidence
    g = int(np.gcd.reduce(np.abs(nz)))
    eff = int(round(16 - math.log2(g))) if g > 0 else 16
    eff = max(1, min(16, eff))
    return {
        "value_gcd": g,
        "effective_bits": eff,
        "requantized": eff <= REQUANT_BITS_MAX,
    }


_BD_FIELDS = "bd_ok boolean, value_gcd int, effective_bits int, requantized boolean"


def _bd_arrow(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from bdqc_spark.plans.profile import _binary_buffers

    for batch in batches:
        n = batch.num_rows
        barr = batch.column(batch.schema.get_field_index("bytes"))
        offsets, data = _binary_buffers(barr)
        nulls = pa.compute.is_null(barr).to_numpy(zero_copy_only=False)
        codec = batch.column(batch.schema.get_field_index("codec")).to_pylist()

        ok = np.zeros(n, dtype=bool)
        gcd = np.zeros(n, dtype=np.int32)
        bits = np.zeros(n, dtype=np.int32)
        req = np.zeros(n, dtype=bool)
        for i in range(n):
            # int16 wire domain only (module docstring: honest scope)
            if nulls[i] or codec[i] != "pcm_s16le":
                continue
            lo, hi = int(offsets[i]), int(offsets[i + 1])
            if (hi - lo) % 2 != 0:
                continue
            st = bitdepth_stats(data[lo:hi].view("<i2"))
            if st is None:
                continue
            ok[i] = True
            gcd[i], bits[i], req[i] = st["value_gcd"], st["effective_bits"], st["requantized"]
        passthrough = {
            name: batch.column(batch.schema.get_field_index(name))
            for name in batch.schema.names
            if name != "bytes"
        }
        yield pa.RecordBatch.from_pydict(
            {
                **passthrough,
                "bd_ok": pa.array(ok),
                "value_gcd": pa.array(np.where(ok, gcd, 0), type=pa.int32()),
                "effective_bits": pa.array(np.where(ok, bits, 0), type=pa.int32()),
                "requantized": pa.array(req),
            }
        )


def clip_bitdepth(clips):
    """clips(bytes, codec, …) → per-clip bit-depth signals. Same
    execution contract as the profile stage (module docstring)."""
    keep = [f for f in clips.schema.fieldNames() if f != "bytes"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in clips.schema if f.name != "bytes"
    )
    return clips.mapInArrow(_bd_arrow, f"{out_schema}, {_BD_FIELDS}").select(
        *keep, "bd_ok", "value_gcd", "effective_bits", "requantized"
    )
