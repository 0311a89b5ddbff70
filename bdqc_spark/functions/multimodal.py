"""Multimodal binary-column plumbing (image / video — audio is the
fully-real path in functions/audio.py).

Contract: media lives as an opaque `binary` column plus typed
metadata columns; per-modality feature extraction runs as Arrow-
batched `mapInPandas` over (bytes, metadata). The Spark-side shape —
schema, batch flow, partitioning, null/corrupt handling — is real
and tested.

Image decoding is REAL for PNG and baseline JPEG: PNG via a
from-scratch decoder (stdlib zlib inflate + chunk parse + scanline
filter reconstruction per the PNG spec — sub/up/average/paeth,
8-bit grayscale/RGB/RGBA/palette); JPEG via the from-scratch
baseline codec in functions/jpeg.py (marker parse, canonical
Huffman, dequant + IDCT, 4:2:0/4:2:2/4:4:4 chroma upsampling,
YCbCr→RGB); plus the engine's raw RGB8 debug format (8-byte header
"RGB8" + w:u16 + h:u16, then w*h*3 bytes).

Video decoding is REAL for Y4M (YUV4MPEG2): the mjpegtools stream
format every ffmpeg ships — an ASCII "YUV4MPEG2 W.. H.. F.. C..\\n"
stream header followed by "FRAME\\n" + raw planar YUV per frame. The
parser handles C420*/C422/C444/Cmono chroma modes, frame-samples
every k-th Y (luma) plane without touching the skipped bytes, and
feeds profile_videos (per-clip luma stats + inter-frame motion).
Compressed-video SAMPLE decode (H.264/VP9 entropy coding) remains a
NotImplementedError stub — no ffmpeg in this sandbox; the mp4 and
webm CONTAINERS themselves are fully parsed by the from-scratch
ISO-BMFF box parser (functions/mp4.py) and EBML/Matroska parser
(functions/webm.py): tracks, codec ids, dimensions, fps, sample
rate, durations, truncation checks.
`decode_video_frames` samples the concatenated-RGB8 debug format.
Swapping in a real sample decoder changes ONE function; every
Spark-facing schema and UDF signature stays fixed.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURES_SCHEMA = (
    "width int, height int, n_channels int, mean_r double, mean_g double, "
    "mean_b double, brightness double, decode_ok boolean"
)

_MAGIC = b"RGB8"


def encode_image_rgb8(arr: np.ndarray) -> bytes:
    """Deterministic debug encoder: (h, w, 3) uint8 → RGB8 payload."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return _MAGIC + struct.pack("<HH", w, h) + arr.tobytes()


# --------------------------------------------------------------------------
# From-scratch PNG codec (PNG spec, RFC 2083): chunk parse, zlib
# inflate, per-scanline filter reconstruction. 8-bit depth, color
# types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
# non-interlaced. Everything numpy + stdlib zlib.
# --------------------------------------------------------------------------
PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(raw: bytes):
    pos = 8
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        crc = raw[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != zlib.crc32(ctype + data):
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return


def _unfilter(decomp: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Invert per-scanline filters. Returns (h, w*bpp) uint8.

    Sub/Average/Paeth carry a within-row serial dependency, so rows
    with those filters run a per-pixel loop; Up/None are vectorized.
    (Per-clip images are small; the batch loop above is the unit of
    parallelism, same as the audio path.)"""
    stride = w * bpp + 1
    if decomp.size != h * stride:
        raise ValueError("PNG data size mismatch")
    rows = decomp.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * bpp, np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            rec = np.zeros(w * bpp, np.int32)
            for x in range(w * bpp):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB (alpha dropped, gray/palette
    expanded). 8-bit non-interlaced only — the overwhelmingly common
    case; 16-bit/interlaced raise ValueError (degrades, not crashes)."""
    if not raw.startswith(PNG_SIG):
        raise ValueError("not a PNG signature")
    ihdr = None
    palette = None
    idat = []
    for ctype, data in _png_chunks(raw):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant (16-bit/interlaced)")
    if ctype_i not in _PNG_CHANNELS or w == 0 or h == 0:
        raise ValueError(f"unsupported PNG color type {ctype_i}")
    bpp = _PNG_CHANNELS[ctype_i]
    try:
        decomp = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    except zlib.error as e:  # corrupt stream degrades like any bad payload
        raise ValueError(f"PNG inflate failed: {e}") from e
    flat = _unfilter(decomp, h, w, bpp)
    px = flat.reshape(h, w, bpp)
    if ctype_i == 2:
        return np.ascontiguousarray(px)
    if ctype_i == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype_i == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_i == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if palette is None:
        raise ValueError("palette PNG missing PLTE")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise ValueError("palette index out of range")
    return palette[idx]


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3|4) uint8 → minimal valid PNG. `filter_type` applies one
    filter to every scanline (0/1/2/3/4) — the encoder exists so tests
    can exercise every reconstruction path without external libs."""
    h, w, c = arr.shape
    assert arr.dtype == np.uint8 and c in (3, 4)
    ctype_i = 2 if c == 3 else 6
    img = arr.astype(np.int32)
    flat = img.reshape(h, w * c)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(w * c, np.int32)
        a = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        b = prev
        cc = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - a
        elif filter_type == 2:
            enc = cur - b
        elif filter_type == 3:
            enc = cur - ((a + b) >> 1)
        elif filter_type == 4:
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_i, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_image(raw: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8. PNG decodes for real (from-scratch
    decoder above), baseline JPEG decodes for real (from-scratch
    codec in functions/jpeg.py), the RGB8 debug format decodes;
    other formats raise (callers treat any raise as decode_ok=False,
    same as corrupt audio)."""
    if raw[:8] == PNG_SIG:
        return decode_png(raw)
    if raw[:2] == b"\xff\xd8":
        from bdqc_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(raw)
    if len(raw) < 8 or raw[:4] != _MAGIC:
        raise NotImplementedError(
            "only PNG, baseline JPEG and the RGB8 debug format are "
            "decodable in this sandbox"
        )
    w, h = struct.unpack("<HH", raw[4:8])
    body = np.frombuffer(raw, dtype=np.uint8, offset=8)
    if body.size != w * h * 3:
        raise ValueError("RGB8 payload size mismatch")
    return body.reshape(h, w, 3)


def image_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (image_id, bytes) → IMAGE_FEATURES_SCHEMA.

    Same batch discipline as the audio profiler: per-batch Python,
    per-pixel numpy.
    """
    for pdf in batches:
        n = len(pdf)
        out = {
            "width": np.zeros(n, np.int32),
            "height": np.zeros(n, np.int32),
            "n_channels": np.zeros(n, np.int32),
            "mean_r": np.zeros(n),
            "mean_g": np.zeros(n),
            "mean_b": np.zeros(n),
            "brightness": np.zeros(n),
            "decode_ok": np.zeros(n, bool),
        }
        for i, raw in enumerate(pdf["bytes"]):
            if raw is None:
                continue
            try:
                img = decode_image(bytes(raw))
            except (NotImplementedError, ValueError):
                continue
            out["decode_ok"][i] = True
            out["height"][i], out["width"][i], out["n_channels"][i] = img.shape
            means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
            out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = means
            out["brightness"][i] = float(means.mean())
        cols = {k: v for k, v in out.items()}
        for keep in pdf.columns:
            if keep != "bytes":
                cols[keep] = pdf[keep].to_numpy()
        yield pd.DataFrame(cols)


def profile_images(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """images(id, bytes [, meta...]) → per-image feature rows.
    Passthrough columns are preserved; bytes never leaves the stage."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields if f.name != "bytes"
    )
    return images.mapInPandas(image_features_batches, f"{passthrough}, {IMAGE_FEATURES_SCHEMA}")


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, 3) uint8 → (out_h, out_w, 3) uint8 bilinear resize —
    vectorized numpy gather (4 corner reads + 2 lerps per output
    pixel, no Python loops). Uses the half-pixel-center convention
    (align_corners=False, the OpenCV/PIL default), so up- and
    down-scaling are both well-defined and an identity resize is
    exact."""
    if out_h < 1 or out_w < 1:
        raise ValueError(f"bad target size {out_h}x{out_w}")
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    # half-pixel centers: src = (dst + 0.5) * scale - 0.5
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.minimum(ys.astype(np.int64), h - 1)
    x0 = np.minimum(xs.astype(np.int64), w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    p = img.astype(np.float32)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _resize_batches(out_h: int, out_w: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, bool)
            payload: list = [None] * n
            for i, raw in enumerate(pdf["bytes"]):
                if raw is None:
                    continue
                try:
                    img = decode_image(bytes(raw))
                    payload[i] = encode_png(resize_bilinear(img, out_h, out_w))
                except (NotImplementedError, ValueError):
                    continue
                ok[i] = True
            cols = {"bytes": payload, "resize_ok": ok, "width": np.where(ok, out_w, 0).astype(np.int32), "height": np.where(ok, out_h, 0).astype(np.int32)}
            for keep in pdf.columns:
                if keep != "bytes":
                    cols[keep] = pdf[keep].to_numpy()
            yield pd.DataFrame(cols)

    return run


def resize_images(images: DataFrame, height: int, width: int) -> DataFrame:
    """images(id, bytes [, meta...]) → same rows with `bytes` resized
    to (height, width) and re-encoded as PNG (the one format this
    sandbox can both decode and encode losslessly). Same execution
    contract as profile_images: one mapInPandas pass, bytes consumed
    inside the stage, corrupt/undecodable rows degrade to
    resize_ok=false with a null payload — the batch-prep step a
    vision training pipeline runs ahead of tensorization."""
    if height < 1 or width < 1:
        raise ValueError(f"bad target size {height}x{width}")
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in images.schema.fields
        if f.name != "bytes"
    )
    return images.mapInPandas(
        _resize_batches(height, width),
        f"{passthrough}, bytes binary, resize_ok boolean, width int, height int",
    )


def decode_video_frames(raw: bytes, every_k: int = 2) -> list[np.ndarray]:
    """Debug 'video' = concatenated RGB8 frames; sample every k-th.
    Real containers are PROFILED by the from-scratch parsers
    (functions/mp4.py, functions/webm.py); compressed SAMPLE decode
    (H.264/VP9 entropy coding) stays out of scope in this sandbox."""
    frames = []
    pos = 0
    idx = 0
    while pos + 8 <= len(raw):
        if raw[pos : pos + 4] != _MAGIC:
            raise NotImplementedError("only concatenated RGB8 frames are decodable")
        w, h = struct.unpack("<HH", raw[pos + 4 : pos + 8])
        end = pos + 8 + w * h * 3
        if end > len(raw):
            raise ValueError("truncated frame")
        if idx % every_k == 0:
            frames.append(np.frombuffer(raw[pos + 8 : end], dtype=np.uint8).reshape(h, w, 3))
        pos = end
        idx += 1
    return frames


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — wire-format uncompressed video streams
# --------------------------------------------------------------------------
_Y4M_MAGIC = b"YUV4MPEG2"
# chroma tag → (x subsample, y subsample); planes are Y then U then V
_Y4M_CHROMA = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420paldv": (2, 2),
    "420mpeg2": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def parse_y4m_header(raw: bytes) -> dict:
    """Stream header → {width, height, fps, chroma, frame_bytes,
    data_start}. Raises ValueError when malformed."""
    if not raw.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = raw.find(b"\n", 0, 512)
    if nl < 0:
        raise ValueError("y4m stream header unterminated")
    w = h = 0
    fps = 0.0
    chroma = "420jpeg"  # the spec's default when no C tag is present
    for tok in raw[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = int(num) / max(int(den), 1)
        elif tag == "C":
            chroma = val
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    if chroma not in _Y4M_CHROMA:
        raise ValueError(f"y4m chroma mode {chroma!r} unsupported")
    sub = _Y4M_CHROMA[chroma]
    luma = w * h
    if sub is None:
        frame_bytes = luma
    else:
        sx, sy = sub
        # chroma plane dims round UP for odd sizes (ceil division)
        cw, ch = (w + sx - 1) // sx, (h + sy - 1) // sy
        frame_bytes = luma + 2 * cw * ch
    return {
        "width": w,
        "height": h,
        "fps": fps,
        "chroma": chroma,
        "frame_bytes": frame_bytes,
        "data_start": nl + 1,
    }


def decode_y4m_frames(raw: bytes, every_k: int = 1) -> tuple[dict, list[np.ndarray]]:
    """(header, [luma planes as (h, w) uint8 arrays] for every k-th
    frame). Skipped frames are never copied — the walk advances by
    offset arithmetic only. Raises ValueError on truncated frames or
    a missing FRAME marker."""
    info = parse_y4m_header(raw)
    w, h, fb = info["width"], info["height"], info["frame_bytes"]
    frames: list[np.ndarray] = []
    pos = info["data_start"]
    idx = 0
    n = len(raw)
    while pos < n:
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m FRAME marker missing")
        nl = raw.find(b"\n", pos, pos + 256)
        if nl < 0:
            raise ValueError("y4m frame header unterminated")
        body = nl + 1
        if body + fb > n:
            raise ValueError("y4m frame truncated")
        if idx % every_k == 0:
            frames.append(
                np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=body).reshape(h, w)
            )
        pos = body + fb
        idx += 1
    info["n_frames"] = idx
    return info, frames


def encode_y4m(
    frames: list[np.ndarray], fps: float = 25.0, chroma: str = "420jpeg"
) -> bytes:
    """Luma planes (h, w) uint8 → Y4M stream; chroma planes are
    written neutral (128). Used by the synthetic corpus and tests."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    sub = _Y4M_CHROMA[chroma]
    num = int(round(fps * 1000))
    head = f"YUV4MPEG2 W{w} H{h} F{num}:1000 Ip A1:1 C{chroma}\n".encode()
    if sub is None:
        pad = b""
    else:
        sx, sy = sub
        pad = b"\x80" * (2 * (((w + sx - 1) // sx) * ((h + sy - 1) // sy)))
    out = [head]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("inconsistent frame dims")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        out.append(pad)
    return b"".join(out)


VIDEO_FEATURES_SCHEMA = (
    "decode_ok boolean, width int, height int, n_frames int, fps double, "
    "chroma string, sampled_frames int, luma_mean double, luma_std double, "
    "motion double"
)


def video_features_batches(
    batches: Iterator[pd.DataFrame], every_k: int = 5
) -> Iterator[pd.DataFrame]:
    """(id, bytes [, meta...]) → per-video stats over every k-th luma
    plane: brightness mean/std and `motion` = mean |Δ| between
    consecutive sampled frames (scene-change / static-slate signal).
    Corrupt rows degrade to decode_ok=false."""
    for pdf in batches:
        n = len(pdf)
        out = {
            "decode_ok": np.zeros(n, bool),
            "width": np.zeros(n, np.int32),
            "height": np.zeros(n, np.int32),
            "n_frames": np.zeros(n, np.int32),
            "fps": np.zeros(n, np.float64),
            "chroma": [""] * n,
            "sampled_frames": np.zeros(n, np.int32),
            "luma_mean": np.zeros(n, np.float64),
            "luma_std": np.zeros(n, np.float64),
            "motion": np.zeros(n, np.float64),
        }
        for i, raw in enumerate(pdf["bytes"]):
            if raw is None:
                continue
            try:
                info, frames = decode_y4m_frames(bytes(raw), every_k=every_k)
            except (ValueError, NotImplementedError):
                continue
            if not frames:
                continue
            stack = np.stack(frames).astype(np.float64)
            out["decode_ok"][i] = True
            out["width"][i] = info["width"]
            out["height"][i] = info["height"]
            out["n_frames"][i] = info["n_frames"]
            out["fps"][i] = info["fps"]
            out["chroma"][i] = info["chroma"]
            out["sampled_frames"][i] = len(frames)
            out["luma_mean"][i] = float(stack.mean())
            out["luma_std"][i] = float(stack.std())
            if len(frames) > 1:
                out["motion"][i] = float(np.abs(np.diff(stack, axis=0)).mean())
        keep = pdf.drop(columns=["bytes"])
        yield pd.concat([keep.reset_index(drop=True), pd.DataFrame(out)], axis=1)


def profile_videos(videos: DataFrame, id_col: str = "video_id") -> DataFrame:
    """videos(id, bytes [, meta...]) → per-video feature rows; same
    contract as profile_images (bytes never leaves the stage)."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in videos.schema.fields
        if f.name != "bytes"
    )
    return videos.mapInPandas(video_features_batches, f"{passthrough}, {VIDEO_FEATURES_SCHEMA}")
