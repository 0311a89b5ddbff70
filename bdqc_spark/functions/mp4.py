"""From-scratch MP4 / ISO-BMFF container parser (ISO/IEC 14496-12).

The last "documented stub" modality: compressed-video SAMPLE decode
(H.264/VP9 entropy coding) is genuinely out of scope in this sandbox,
but the CONTAINER is a plain box grammar a data pipeline profiles at
ingest without ever touching a codec — which tracks exist, codec
fourccs, dimensions, sample rate, durations, sample counts, media
payload size. That profile is what a 100-TB video corpus QC pass
needs (dimension/fps/duration outliers, truncated files, wrong-codec
rows) and it reads only the few KB of `moov` metadata per file.

Implements, from the public spec:
- the box grammar: [size:u32][type:4cc][payload], size==1 → 64-bit
  largesize follows, size==0 → box extends to end of file;
- container recursion into moov/trak/mdia/minf/stbl/edts;
- ftyp (brands), mvhd/tkhd/mdhd version 0 AND 1 (u32/u64 times),
  hdlr (handler fourcc), stsd Visual/AudioSampleEntry layouts,
  stts (decode deltas → fps), stsz, stco/co64, mdat accounting;
- strict truncation checks: a box whose declared size overruns the
  buffer is a parse error, not a silent partial read.

A deterministic from-scratch writer (`build_test_mp4`) assembles
spec-shaped fixtures (ftyp + mdat + moov with one video and one
audio track, including largesize/version-1 variants) so tests and
the registry query need no external media.

Spark contract matches profile_images (multimodal.py): one
mapInPandas pass, bytes consumed inside the stage, corrupt rows
degrade to parse_ok=false. Reference parity: the reference's
fileType dispatch / binary signature rows (SURVEY.md §2 A2/A6)
profile opaque media by sniffing container structure — this is that
operation for the ISO-BMFF family (mp4/m4a/mov).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}

MP4_PROFILE_SCHEMA = (
    "parse_ok boolean, major_brand string, timescale int, duration_ms double, "
    "n_tracks int, n_boxes int, mdat_bytes bigint, "
    "video_codec string, width int, height int, video_n_samples int, fps double, "
    "audio_codec string, channels int, sample_rate int, audio_n_samples int"
)


# --------------------------------------------------------------------------
# box walk
# --------------------------------------------------------------------------
def _iter_boxes(buf: memoryview, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    buf[start:end]; raises ValueError on truncation / malformed size."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated mp4: box header overruns buffer")
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated mp4: largesize overruns buffer")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            raise ValueError(f"bad mp4 box size {size} for {btype!r}")
        if pos + size > end:
            raise ValueError(f"truncated mp4: {btype!r} declares {size} bytes")
        yield btype, pos + hdr, pos + size
        pos += size


def _fullbox(buf: memoryview, s: int) -> tuple[int, int]:
    """(version, payload-start-after-version/flags)."""
    return buf[s], s + 4


def _read_mvhd(buf, s, e):
    v, p = _fullbox(buf, s)
    if v == 1:
        ts, dur = struct.unpack_from(">I", buf, p + 16)[0], struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        ts, dur = struct.unpack_from(">II", buf, p + 8)
    return ts, dur


def _read_mdhd(buf, s, e):
    v, p = _fullbox(buf, s)
    if v == 1:
        ts, dur = struct.unpack_from(">I", buf, p + 16)[0], struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        ts, dur = struct.unpack_from(">II", buf, p + 8)
    return ts, dur


def _read_hdlr(buf, s, e) -> str:
    _, p = _fullbox(buf, s)
    return bytes(buf[p + 4 : p + 8]).decode("latin-1")


def _read_stsd(buf, s, e, handler: str) -> dict:
    """First sample entry: codec fourcc + the handler-specific fields.
    VisualSampleEntry / AudioSampleEntry layouts per 14496-12 §12."""
    _, p = _fullbox(buf, s)
    (n_entries,) = struct.unpack_from(">I", buf, p)
    out: dict = {}
    if n_entries < 1:
        return out
    ep = p + 4
    (esize,) = struct.unpack_from(">I", buf, ep)
    if esize < 16 or ep + esize > e:
        raise ValueError("truncated stsd sample entry")
    out["codec"] = bytes(buf[ep + 4 : ep + 8]).decode("latin-1")
    body = ep + 16  # past SampleEntry: reserved(6) + data_reference_index(2)
    if handler == "vide":
        # pre_defined(2) reserved(2) pre_defined(12) width(2) height(2)
        out["width"], out["height"] = struct.unpack_from(">HH", buf, body + 16)
    elif handler == "soun":
        # reserved(8) channelcount(2) samplesize(2) pre_defined(2)
        # reserved(2) samplerate(4, 16.16 fixed)
        out["channels"] = struct.unpack_from(">H", buf, body + 8)[0]
        out["sample_rate"] = struct.unpack_from(">I", buf, body + 16)[0] >> 16
    return out


def _read_stts(buf, s, e) -> tuple[int, int]:
    """→ (n_samples, total_decode_ticks)."""
    _, p = _fullbox(buf, s)
    (n,) = struct.unpack_from(">I", buf, p)
    if p + 4 + 8 * n > e:
        raise ValueError("truncated stts")
    if n == 0:
        return 0, 0
    arr = np.frombuffer(buf[p + 4 : p + 4 + 8 * n], dtype=">u4").reshape(n, 2)
    counts = arr[:, 0].astype(np.int64)
    deltas = arr[:, 1].astype(np.int64)
    return int(counts.sum()), int((counts * deltas).sum())


def _read_stsz(buf, s, e) -> int:
    _, p = _fullbox(buf, s)
    fixed, count = struct.unpack_from(">II", buf, p)
    return int(count)


def parse_mp4(raw: bytes) -> dict:
    """Container profile of an ISO-BMFF file; raises ValueError on a
    malformed/truncated stream (the caller maps that to parse_ok=false)."""
    if len(raw) < 12:
        raise ValueError("too short for an mp4")
    buf = memoryview(raw)
    prof: dict = {
        "major_brand": None,
        "timescale": None,
        "duration_ms": None,
        "n_tracks": 0,
        "n_boxes": 0,
        "mdat_bytes": 0,
        "tracks": [],
    }
    saw_ftyp_or_moov = False

    def walk(start: int, end: int, ctx: dict):
        for btype, ps, pe in _iter_boxes(buf, start, end):
            prof["n_boxes"] += 1
            if btype == b"ftyp":
                prof["major_brand"] = bytes(buf[ps : ps + 4]).decode("latin-1")
            elif btype == b"mvhd":
                ts, dur = _read_mvhd(buf, ps, pe)
                if ts <= 0:
                    raise ValueError("mvhd timescale must be positive")
                prof["timescale"] = ts
                prof["duration_ms"] = dur / ts * 1000.0
            elif btype == b"mdat":
                prof["mdat_bytes"] += pe - ps
            elif btype == b"trak":
                trk: dict = {}
                prof["tracks"].append(trk)
                walk(ps, pe, trk)
            elif btype == b"mdhd":
                ts, dur = _read_mdhd(buf, ps, pe)
                if ts <= 0:
                    raise ValueError("mdhd timescale must be positive")
                ctx["media_timescale"], ctx["media_duration"] = ts, dur
            elif btype == b"hdlr":
                ctx["handler"] = _read_hdlr(buf, ps, pe)
            elif btype == b"stsd":
                ctx.update(_read_stsd(buf, ps, pe, ctx.get("handler", "")))
            elif btype == b"stts":
                ctx["n_samples"], ctx["decode_ticks"] = _read_stts(buf, ps, pe)
            elif btype == b"stsz":
                ctx["n_sizes"] = _read_stsz(buf, ps, pe)
            elif btype in _CONTAINERS:
                walk(ps, pe, ctx)

    walk(0, len(raw), prof)
    prof["n_tracks"] = len(prof["tracks"])
    if prof["major_brand"] is None and not prof["tracks"]:
        raise ValueError("no ftyp or moov: not an mp4")
    for trk in prof["tracks"]:
        ticks = trk.get("decode_ticks", 0)
        ts = trk.get("media_timescale", 0)
        if trk.get("handler") == "vide" and ticks > 0 and ts > 0:
            trk["fps"] = trk.get("n_samples", 0) * ts / ticks
    return prof


# --------------------------------------------------------------------------
# deterministic writer (test fixtures; spec-shaped, codec payload fake)
# --------------------------------------------------------------------------
def _box(btype: bytes, payload: bytes, force_large: bool = False) -> bytes:
    if force_large:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def _stts(n: int, delta: int) -> bytes:
    return _full(b"stts", 0, struct.pack(">III", 1, n, delta) if n else struct.pack(">I", 0))


def _stbl(entry: bytes, n: int, delta: int, sample_size: int, offset: int) -> bytes:
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
    stsz = _full(b"stsz", 0, struct.pack(">II", sample_size, n))
    stco = _full(b"stco", 0, struct.pack(">II", 1, offset))
    return _box(b"stbl", stsd + _stts(n, delta) + stsz + stco)


def _sample_entry(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 16 + len(body)) + fourcc + b"\x00" * 6 + struct.pack(">H", 1) + body


def _trak(
    track_id: int,
    movie_ts: int,
    movie_dur: int,
    media_ts: int,
    media_dur: int,
    handler: bytes,
    entry: bytes,
    n: int,
    delta: int,
    tkhd_version: int = 0,
    width: int = 0,
    height: int = 0,
) -> bytes:
    wh = struct.pack(">II", width << 16, height << 16)
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    if tkhd_version == 1:
        tkhd = _full(
            b"tkhd", 1,
            struct.pack(">QQIIQ", 0, 0, track_id, 0, movie_dur)
            + b"\x00" * 16 + matrix + wh,
        )
    else:
        tkhd = _full(
            b"tkhd", 0,
            struct.pack(">IIIII", 0, 0, track_id, 0, movie_dur)
            + b"\x00" * 16 + matrix + wh,
        )
    mdhd = _full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, media_ts, media_dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"bdqc\x00")
    mhd = _full(b"vmhd" if handler == b"vide" else b"smhd", 0, b"\x00" * 8)
    dref = _full(b"dref", 0, struct.pack(">I", 1) + _box(b"url ", bytes([0, 0, 0, 1])))
    dinf = _box(b"dinf", dref)
    stbl = _stbl(entry, n, delta, sample_size=64, offset=40)
    minf = _box(b"minf", mhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def build_test_mp4(
    width: int = 64,
    height: int = 48,
    fps: int = 25,
    n_frames: int = 50,
    sr: int = 16000,
    channels: int = 1,
    audio_ms: int | None = None,
    mdat_payload: bytes = b"\x00" * 256,
    large_mdat: bool = False,
    mvhd_version: int = 0,
    video_codec: bytes = b"avc1",
    audio_codec: bytes = b"mp4a",
) -> bytes:
    """Assemble a deterministic two-track (video+audio) mp4. Codec
    payloads are fake (the container is what's under test); every box
    layout follows 14496-12 so real demuxers agree on the metadata."""
    movie_ts = 1000
    video_ts = fps * 1000
    video_dur_ticks = n_frames * 1000  # delta=1000 ticks/frame
    dur_ms = n_frames * 1000 // fps
    if audio_ms is None:
        audio_ms = dur_ms
    n_aframes = audio_ms * sr // 1000 // 1024  # 1024-sample packets
    ventry = _sample_entry(
        video_codec,
        struct.pack(">HH", 0, 0) + b"\x00" * 12
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1),
    )
    aentry = _sample_entry(
        audio_codec,
        b"\x00" * 8 + struct.pack(">HHHHI", channels, 16, 0, 0, sr << 16),
    )
    movie_dur = max(dur_ms, audio_ms)
    if mvhd_version == 1:
        mvhd = _full(
            b"mvhd", 1,
            struct.pack(">QQIQ", 0, 0, movie_ts, movie_dur)
            + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 3),
        )
    else:
        mvhd = _full(
            b"mvhd", 0,
            struct.pack(">IIII", 0, 0, movie_ts, movie_dur)
            + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 3),
        )
    vtrak = _trak(1, movie_ts, movie_dur, video_ts, video_dur_ticks,
                  b"vide", ventry, n_frames, 1000, width=width, height=height)
    atrak = _trak(2, movie_ts, movie_dur, sr, n_aframes * 1024,
                  b"soun", aentry, n_aframes, 1024, tkhd_version=1)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp42")
    mdat = _box(b"mdat", mdat_payload, force_large=large_mdat)
    moov = _box(b"moov", mvhd + vtrak + atrak)
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# Spark plumbing — same contract as profile_images
# --------------------------------------------------------------------------
def _mp4_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw in pdf["bytes"]:
            row = {
                "parse_ok": False, "major_brand": None, "timescale": None,
                "duration_ms": None, "n_tracks": 0, "n_boxes": 0,
                "mdat_bytes": 0, "video_codec": None, "width": None,
                "height": None, "video_n_samples": None, "fps": None,
                "audio_codec": None, "channels": None, "sample_rate": None,
                "audio_n_samples": None,
            }
            if raw is not None:
                try:
                    p = parse_mp4(bytes(raw))
                    row.update(
                        parse_ok=True, major_brand=p["major_brand"],
                        timescale=p["timescale"], duration_ms=p["duration_ms"],
                        n_tracks=p["n_tracks"], n_boxes=p["n_boxes"],
                        mdat_bytes=p["mdat_bytes"],
                    )
                    for trk in p["tracks"]:
                        if trk.get("handler") == "vide" and row["video_codec"] is None:
                            row.update(
                                video_codec=trk.get("codec"),
                                width=trk.get("width"), height=trk.get("height"),
                                video_n_samples=trk.get("n_samples"),
                                fps=trk.get("fps"),
                            )
                        elif trk.get("handler") == "soun" and row["audio_codec"] is None:
                            row.update(
                                audio_codec=trk.get("codec"),
                                channels=trk.get("channels"),
                                sample_rate=trk.get("sample_rate"),
                                audio_n_samples=trk.get("n_samples"),
                            )
                except (ValueError, struct.error):
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "bytes":
                out[keep] = pdf[keep].to_numpy()
        yield out


def profile_mp4(videos: DataFrame) -> DataFrame:
    """videos(id, bytes [, meta...]) → per-file container profile.
    One mapInPandas pass; bytes never leaves the stage; corrupt rows
    degrade to parse_ok=false."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in videos.schema.fields
        if f.name != "bytes"
    )
    return videos.mapInPandas(_mp4_batches, f"{passthrough}, {MP4_PROFILE_SCHEMA}")
