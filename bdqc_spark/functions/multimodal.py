"""Multimodal binary-column plumbing (image / video — audio is the
fully-real path in functions/audio.py).

Contract: media lives as an opaque `binary` column plus typed
metadata columns; per-modality feature extraction runs as Arrow-
batched `mapInPandas` over (bytes, metadata). The Spark-side shape —
schema, batch flow, partitioning, null/corrupt handling — is real
and tested; the pixel/frame DECODERS are stubs because no image/
video codec libraries exist in this sandbox:

- `decode_image` raises NotImplementedError unless the payload is in
  the engine's raw RGB8 debug format (deterministic fake used by
  tests: 8-byte header "RGB8" + w:u16 + h:u16, then w*h*3 bytes).
- `decode_video_frames` samples frames from the same debug format
  concatenated per frame.

Swapping in real decoders (PIL/ffmpeg) changes ONE function each;
every Spark-facing schema and UDF signature stays fixed.
"""

from __future__ import annotations

import struct
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


def decode_image(raw: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8. Real codecs (JPEG/PNG) are NOT
    available in this sandbox — only the RGB8 debug format decodes;
    anything else raises NotImplementedError (callers treat it as
    decode_ok=False, same as corrupt audio)."""
    if len(raw) < 8 or raw[:4] != _MAGIC:
        raise NotImplementedError("only the RGB8 debug format is decodable in this sandbox")
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


def decode_video_frames(raw: bytes, every_k: int = 2) -> list[np.ndarray]:
    """Debug 'video' = concatenated RGB8 frames; sample every k-th.
    Real containers (mp4/webm) are NOT decodable in this sandbox."""
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
