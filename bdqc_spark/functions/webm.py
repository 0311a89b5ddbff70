"""From-scratch WebM / Matroska container parser (EBML, RFC 8794).

The ISO-BMFF profiler (functions/mp4.py) covers the mp4/m4a/mov
family; this module covers the OTHER de-facto web video container —
WebM/Matroska — so the ingest-time fileType dispatch (reference A2,
SURVEY.md §2) spans both. Compressed SAMPLE decode (VP9/Opus entropy
coding) stays out of scope in this sandbox; the CONTAINER is an EBML
element grammar a QC pass profiles without touching a codec: doc
type, timestamp scale, duration, per-track codec ids, video
dimensions, audio rate/channels, cluster accounting.

Implements, from the public specs:
- EBML varints: element IDs keep their marker bit (RFC 8794 §5),
  element sizes strip it; an all-ones size VINT means UNKNOWN size
  (legal for the streamed-master elements Segment and Cluster, where
  the element then extends to its parent's end — the shape streaming
  muxers emit; unknown size anywhere else is a parse error);
- the Matroska element set a profile needs: EBML header (DocType,
  DocTypeVersion), Segment, Info (TimestampScale, Duration float32
  or float64), Tracks/TrackEntry (TrackType, CodecID, Video
  PixelWidth/PixelHeight, Audio SamplingFrequency/Channels), Cluster
  (counted and sized, payload skipped);
- strict truncation checks: an element whose declared size overruns
  its parent is a parse error, not a silent partial read.

A deterministic from-scratch writer (``build_test_webm``) assembles
spec-shaped fixtures (webm/mkv doc types, unknown-size Segment
variant, float32/float64 Duration) so tests need no external media.

Spark contract matches profile_mp4: one mapInPandas pass, bytes
consumed inside the stage, corrupt rows degrade to parse_ok=false.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EBML_MAGIC = b"\x1aE\xdf\xa3"

# element ids (marker bit kept, per RFC 8794)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQUENCY = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3

_UNKNOWN_SIZE_OK = {_SEGMENT, _CLUSTER}

WEBM_PROFILE_SCHEMA = (
    "parse_ok boolean, doc_type string, timescale_ns bigint, duration_ms double, "
    "n_tracks int, n_clusters int, cluster_bytes bigint, "
    "video_codec string, width int, height int, "
    "audio_codec string, channels int, sample_rate int"
)


# --------------------------------------------------------------------------
# EBML primitives
# --------------------------------------------------------------------------
def _vint(buf: bytes, pos: int, end: int, keep_marker: bool) -> tuple[int, int, bool]:
    """Read one VINT at ``pos``; returns (value, new_pos, is_all_ones).
    Element IDs keep the length-marker bit, sizes strip it."""
    if pos >= end:
        raise ValueError("EBML: truncated VINT")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("EBML: invalid VINT lead byte 0x00")
    length = 1
    while not (b0 & (0x80 >> (length - 1))):
        length += 1
    if pos + length > end:
        raise ValueError("EBML: VINT overruns buffer")
    val = b0 if keep_marker else b0 & (0xFF >> length)
    for k in range(1, length):
        val = (val << 8) | buf[pos + k]
    all_ones = not keep_marker and val == (1 << (7 * length)) - 1
    return val, pos + length, all_ones


def _iter_elements(buf: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end, unknown_size) for each
    element in buf[start:end]."""
    pos = start
    while pos < end:
        eid, pos, _ = _vint(buf, pos, end, keep_marker=True)
        size, pos, unknown = _vint(buf, pos, end, keep_marker=False)
        if unknown:
            if eid not in _UNKNOWN_SIZE_OK:
                raise ValueError(f"EBML: unknown size on non-streamable element 0x{eid:X}")
            payload_end = end
        else:
            payload_end = pos + size
            if payload_end > end:
                raise ValueError("EBML: element overruns parent")
        yield eid, pos, payload_end, unknown
        pos = payload_end


def _uint(buf: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise ValueError("EBML: uint wider than 8 bytes")
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError(f"EBML: float must be 4 or 8 bytes, got {n}")


def _string(buf: bytes, s: int, e: int) -> str:
    return buf[s:e].rstrip(b"\x00").decode("utf-8", errors="strict")


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------
def _parse_track(buf: bytes, s: int, e: int) -> dict:
    trk: dict = {}
    for eid, ps, pe, _ in _iter_elements(buf, s, e):
        if eid == _TRACK_TYPE:
            trk["type"] = _uint(buf, ps, pe)
        elif eid == _CODEC_ID:
            trk["codec"] = _string(buf, ps, pe)
        elif eid == _TRACK_NUMBER:
            trk["number"] = _uint(buf, ps, pe)
        elif eid == _VIDEO:
            for vid, vs, ve, _ in _iter_elements(buf, ps, pe):
                if vid == _PIXEL_WIDTH:
                    trk["width"] = _uint(buf, vs, ve)
                elif vid == _PIXEL_HEIGHT:
                    trk["height"] = _uint(buf, vs, ve)
        elif eid == _AUDIO:
            for aid, as_, ae, _ in _iter_elements(buf, ps, pe):
                if aid == _SAMPLING_FREQUENCY:
                    trk["sample_rate"] = _float(buf, as_, ae)
                elif aid == _CHANNELS:
                    trk["channels"] = _uint(buf, as_, ae)
    return trk


def parse_webm(raw: bytes) -> dict:
    """Parse a WebM/Matroska container's structure. Raises ValueError
    on anything malformed or truncated."""
    if not raw.startswith(EBML_MAGIC):
        raise ValueError("not an EBML stream")
    top = _iter_elements(raw, 0, len(raw))
    eid, ps, pe, _ = next(top)
    if eid != _EBML:
        raise ValueError("EBML: first element is not the EBML header")
    doc_type, doc_type_version = None, None
    for hid, hs, he, _ in _iter_elements(raw, ps, pe):
        if hid == _DOCTYPE:
            doc_type = _string(raw, hs, he)
        elif hid == _DOCTYPE_VERSION:
            doc_type_version = _uint(raw, hs, he)
    if doc_type not in ("webm", "matroska"):
        raise ValueError(f"EBML: unsupported DocType {doc_type!r}")

    out: dict = {
        "doc_type": doc_type,
        "doc_type_version": doc_type_version,
        "timestamp_scale": 1_000_000,  # Matroska default: 1 ms in ns
        "duration_ms": None,
        "tracks": [],
        "n_clusters": 0,
        "cluster_bytes": 0,
    }
    duration_units = None
    seg_seen = False
    for eid, ps, pe, _ in top:
        if eid != _SEGMENT:
            continue
        seg_seen = True
        for sid, ss, se, _ in _iter_elements(raw, ps, pe):
            if sid == _INFO:
                for iid, is_, ie, _ in _iter_elements(raw, ss, se):
                    if iid == _TIMESTAMP_SCALE:
                        out["timestamp_scale"] = _uint(raw, is_, ie)
                    elif iid == _DURATION:
                        duration_units = _float(raw, is_, ie)
            elif sid == _TRACKS:
                for tid, ts, te, _ in _iter_elements(raw, ss, se):
                    if tid == _TRACK_ENTRY:
                        out["tracks"].append(_parse_track(raw, ts, te))
            elif sid == _CLUSTER:
                out["n_clusters"] += 1
                out["cluster_bytes"] += se - ss
    if not seg_seen:
        raise ValueError("EBML: no Segment element")
    if duration_units is not None:
        out["duration_ms"] = duration_units * out["timestamp_scale"] / 1e6
    out["n_tracks"] = len(out["tracks"])
    return out


# --------------------------------------------------------------------------
# deterministic writer (spec-shaped fixtures)
# --------------------------------------------------------------------------
def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones reserved for unknown
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint_payload(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_test_webm(
    width: int = 320,
    height: int = 240,
    sample_rate: float = 48000.0,
    channels: int = 2,
    duration_ms: float = 1234.0,
    n_clusters: int = 2,
    video: bool = True,
    audio: bool = True,
    doc_type: str = "webm",
    unknown_size_segment: bool = False,
    float32_duration: bool = False,
    timestamp_scale: int = 1_000_000,
) -> bytes:
    """Assemble a minimal spec-shaped WebM/Matroska file: EBML header +
    Segment(Info, Tracks, Clusters with junk SimpleBlocks)."""
    header = _el(
        _EBML,
        _el(_DOCTYPE, doc_type.encode()) + _el(_DOCTYPE_VERSION, b"\x04"),
    )
    duration_units = duration_ms * 1e6 / timestamp_scale
    dur = (
        struct.pack(">f", duration_units) if float32_duration else struct.pack(">d", duration_units)
    )
    info = _el(
        _INFO,
        _el(_TIMESTAMP_SCALE, _uint_payload(timestamp_scale)) + _el(_DURATION, dur),
    )
    entries = b""
    n = 0
    if video:
        n += 1
        entries += _el(
            _TRACK_ENTRY,
            _el(_TRACK_NUMBER, _uint_payload(n))
            + _el(_TRACK_UID, _uint_payload(n))
            + _el(_TRACK_TYPE, b"\x01")
            + _el(_CODEC_ID, b"V_VP9")
            + _el(_VIDEO, _el(_PIXEL_WIDTH, _uint_payload(width)) + _el(_PIXEL_HEIGHT, _uint_payload(height))),
        )
    if audio:
        n += 1
        entries += _el(
            _TRACK_ENTRY,
            _el(_TRACK_NUMBER, _uint_payload(n))
            + _el(_TRACK_UID, _uint_payload(n))
            + _el(_TRACK_TYPE, b"\x02")
            + _el(_CODEC_ID, b"A_OPUS")
            + _el(
                _AUDIO,
                _el(_SAMPLING_FREQUENCY, struct.pack(">f", sample_rate))
                + _el(_CHANNELS, _uint_payload(channels)),
            ),
        )
    tracks = _el(_TRACKS, entries)
    clusters = b""
    for c in range(n_clusters):
        block = bytes([0x81, 0x00, c, 0x80]) + bytes(16)  # junk VP9/Opus payload
        clusters += _el(
            _CLUSTER,
            _el(_CLUSTER_TIMESTAMP, _uint_payload(c * 500)) + _el(_SIMPLE_BLOCK, block),
        )
    seg_payload = info + tracks + clusters
    if unknown_size_segment:
        segment = _enc_id(_SEGMENT) + b"\xff" + seg_payload
    else:
        segment = _el(_SEGMENT, seg_payload)
    return header + segment


# --------------------------------------------------------------------------
# Spark wrapper
# --------------------------------------------------------------------------
def _webm_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw in pdf["bytes"]:
            row = {
                "parse_ok": False, "doc_type": None, "timescale_ns": None,
                "duration_ms": None, "n_tracks": 0, "n_clusters": 0,
                "cluster_bytes": 0, "video_codec": None, "width": None,
                "height": None, "audio_codec": None, "channels": None,
                "sample_rate": None,
            }
            if raw is not None:
                try:
                    p = parse_webm(bytes(raw))
                    row.update(
                        parse_ok=True, doc_type=p["doc_type"],
                        timescale_ns=p["timestamp_scale"],
                        duration_ms=p["duration_ms"], n_tracks=p["n_tracks"],
                        n_clusters=p["n_clusters"], cluster_bytes=p["cluster_bytes"],
                    )
                    for trk in p["tracks"]:
                        if trk.get("type") == 1 and row["video_codec"] is None:
                            row.update(
                                video_codec=trk.get("codec"),
                                width=trk.get("width"), height=trk.get("height"),
                            )
                        elif trk.get("type") == 2 and row["audio_codec"] is None:
                            sr = trk.get("sample_rate")
                            row.update(
                                audio_codec=trk.get("codec"),
                                channels=trk.get("channels"),
                                sample_rate=int(round(sr)) if sr else None,
                            )
                except (ValueError, UnicodeDecodeError, StopIteration):
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "bytes":
                out[keep] = pdf[keep].to_numpy()
        yield out


def profile_webm(videos: DataFrame) -> DataFrame:
    """videos(id, bytes [, meta...]) → per-file container profile.
    One mapInPandas pass; bytes never leaves the stage; corrupt rows
    degrade to parse_ok=false."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in videos.schema.fields
        if f.name != "bytes"
    )
    return videos.mapInPandas(_webm_batches, f"{passthrough}, {WEBM_PROFILE_SCHEMA}")
