"""SRT / WebVTT subtitle parsing + timed-transcript QC.

Speech corpora rarely ship bare transcripts — they ship cue files
(SubRip .srt, W3C WebVTT) pairing text spans with timestamps. At
ingest, a QC pass over the CUE STRUCTURE catches problems a plain
text filter can't see: overlapping cues (double-speech or OCR
duplication), negative/zero durations, cues past the end of the
audio, implausible chars-per-second (subtitle spam or misalignment),
and poor coverage (transcript describes a fraction of the clip).

From the public formats:
- SRT: blank-line-separated blocks — optional numeric index line,
  `HH:MM:SS,mmm --> HH:MM:SS,mmm` (comma millis), text lines.
- WebVTT: `WEBVTT` header; cue blocks with optional id line,
  `HH:MM:SS.mmm --> HH:MM:SS.mmm` (dot millis, hours optional),
  optional cue settings after the arrow target; NOTE/STYLE/REGION
  blocks skipped.

Malformed blocks are counted, not fatal (a torn cue should not void
a file's QC row); a file with zero parseable cues is an error.

Spark contract: one mapInPandas pass over (id, subtitle-text
[, dur_ms]); per-file QC scalars out. Deterministic writers
(`build_srt`/`build_vtt`) make fixtures. Reference parity: the
reference's text signature rows (SURVEY.md §2 A4) extended to the
timed-transcript shape the audio pairing actually uses.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SRT_TIME = re.compile(
    r"^\s*(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
_VTT_TIME = re.compile(
    r"^\s*(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)


def _srt_ms(h: str, m: str, s: str, ms: str) -> int:
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_srt(text: str) -> tuple[list[dict], int]:
    """→ ([{start_ms, end_ms, text}...], n_bad_blocks)."""
    cues: list[dict] = []
    bad = 0
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [ln for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        # optional index line
        if re.fullmatch(r"\s*\d+\s*", lines[0]) and len(lines) > 1:
            lines = lines[1:]
        m = _SRT_TIME.match(lines[0])
        if not m:
            bad += 1
            continue
        g = m.groups()
        cues.append(
            {
                "start_ms": _srt_ms(*g[:4]),
                "end_ms": _srt_ms(*g[4:]),
                "text": "\n".join(lines[1:]),
            }
        )
    if not cues:
        raise ValueError("no parseable SRT cues")
    return cues, bad


def parse_vtt(text: str) -> tuple[list[dict], int]:
    """→ ([{start_ms, end_ms, text}...], n_bad_blocks)."""
    stripped = text.lstrip("﻿").strip()
    if not stripped.startswith("WEBVTT"):
        raise ValueError("missing WEBVTT header")
    blocks = re.split(r"\n\s*\n", stripped)[1:]  # drop the header block
    cues: list[dict] = []
    bad = 0
    for block in blocks:
        lines = [ln for ln in block.splitlines() if ln.strip()]
        if not lines:
            continue
        if lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        # optional cue id line (anything without an arrow)
        if "-->" not in lines[0] and len(lines) > 1:
            lines = lines[1:]
        m = _VTT_TIME.match(lines[0])
        if not m:
            bad += 1
            continue
        h1, m1, s1, ms1, h2, m2, s2, ms2 = m.groups()
        cues.append(
            {
                "start_ms": _srt_ms(h1 or "0", m1, s1, ms1),
                "end_ms": _srt_ms(h2 or "0", m2, s2, ms2),
                "text": "\n".join(lines[1:]),
            }
        )
    if not cues:
        raise ValueError("no parseable WebVTT cues")
    return cues, bad


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def build_srt(cues: list[dict]) -> str:
    out = []
    for i, c in enumerate(cues, 1):
        out.append(
            f"{i}\n{_fmt_ts(c['start_ms'], ',')} --> "
            f"{_fmt_ts(c['end_ms'], ',')}\n{c['text']}"
        )
    return "\n\n".join(out) + "\n"


def build_vtt(cues: list[dict]) -> str:
    out = ["WEBVTT"]
    for c in cues:
        out.append(
            f"{_fmt_ts(c['start_ms'], '.')} --> "
            f"{_fmt_ts(c['end_ms'], '.')}\n{c['text']}"
        )
    return "\n\n".join(out) + "\n"


def cue_qc(cues: list[dict], clip_dur_ms: int | None = None) -> dict:
    """Structural QC over a parsed cue list. Overlap is measured
    between consecutive cues in START order (the standard subtitle
    invariant); coverage/out-of-bounds need clip_dur_ms."""
    n = len(cues)
    order = sorted(cues, key=lambda c: (c["start_ms"], c["end_ms"]))
    durs = np.array([c["end_ms"] - c["start_ms"] for c in order], dtype=np.int64)
    n_invalid = int((durs <= 0).sum())
    overlap_ms = 0
    n_overlap = 0
    gaps = []
    for a, b in zip(order, order[1:]):
        ov = a["end_ms"] - b["start_ms"]
        if ov > 0:
            n_overlap += 1
            overlap_ms += int(ov)
        else:
            gaps.append(-ov)
    valid = durs > 0
    chars = np.array([len(c["text"].replace("\n", " ")) for c in order], dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cps = np.where(valid, chars / np.maximum(durs, 1) * 1000.0, 0.0)
    speech_ms = int(durs[valid].sum())
    out = {
        "n_cues": n,
        "n_bad_blocks": 0,  # caller overwrites with the parser's count
        "n_invalid": n_invalid,
        "n_overlap": n_overlap,
        "overlap_ms": overlap_ms,
        "speech_ms": speech_ms,
        "median_gap_ms": float(np.median(gaps)) if gaps else 0.0,
        "max_cps": float(cps.max()) if n else 0.0,
        "coverage": None,
        "n_out_of_bounds": None,
    }
    if clip_dur_ms is not None and clip_dur_ms > 0:
        out["coverage"] = min(speech_ms / clip_dur_ms, 1.0)
        out["n_out_of_bounds"] = int(
            sum(1 for c in order if c["end_ms"] > clip_dur_ms)
        )
    return out


SUBTITLE_QC_SCHEMA = (
    "sub_ok boolean, sub_format string, n_cues int, n_bad_blocks int, "
    "n_invalid int, n_overlap int, overlap_ms bigint, speech_ms bigint, "
    "median_gap_ms double, max_cps double, coverage double, n_out_of_bounds int"
)


def _subtitle_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        has_dur = "dur_ms" in pdf.columns
        rows = []
        for j in range(len(pdf)):
            raw = pdf["subtitle"].iloc[j]
            dur = int(pdf["dur_ms"].iloc[j]) if has_dur and pd.notna(pdf["dur_ms"].iloc[j]) else None
            row = {
                "sub_ok": False, "sub_format": None, "n_cues": 0,
                "n_bad_blocks": 0, "n_invalid": 0, "n_overlap": 0,
                "overlap_ms": 0, "speech_ms": 0, "median_gap_ms": None,
                "max_cps": None, "coverage": None, "n_out_of_bounds": None,
            }
            if raw is not None and isinstance(raw, str) and raw.strip():
                try:
                    if raw.lstrip("﻿").lstrip().startswith("WEBVTT"):
                        cues, bad = parse_vtt(raw)
                        fmt = "vtt"
                    else:
                        cues, bad = parse_srt(raw)
                        fmt = "srt"
                    qc = cue_qc(cues, dur)
                    qc["n_bad_blocks"] = bad
                    row.update(qc, sub_ok=True, sub_format=fmt)
                except ValueError:
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "subtitle":
                out[keep] = pdf[keep].to_numpy()
        yield out


def subtitle_qc(files: DataFrame) -> DataFrame:
    """files(id, subtitle [, dur_ms, meta...]) → per-file cue QC; one
    mapInPandas pass, the cue text never leaves the stage."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in files.schema.fields
        if f.name != "subtitle"
    )
    return files.mapInPandas(_subtitle_batches, f"{passthrough}, {SUBTITLE_QC_SCHEMA}")
