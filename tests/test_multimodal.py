"""Multimodal plumbing tests: schema, batch flow, corrupt handling.
Decoders are sandbox stubs (RGB8 debug format) — the Spark-side
contract is what's under test."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bdqc_spark.functions.multimodal import (
    decode_image,
    decode_video_frames,
    encode_image_rgb8,
    profile_images,
)


def _img(seed, w=16, h=8):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rgb8_roundtrip():
    img = _img(1)
    assert np.array_equal(decode_image(encode_image_rgb8(img)), img)


def test_unknown_format_raises_not_implemented():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_profile_images_spark(spark):
    imgs = [_img(i) for i in range(6)]
    rows = [(i, bytearray(encode_image_rgb8(img))) for i, img in enumerate(imgs)]
    rows.append((99, bytearray(b"JUNKDATA")))  # undecodable → decode_ok False
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes"]))
    out = profile_images(df).toPandas().sort_values("image_id").reset_index(drop=True)
    assert list(out.columns[:1]) == ["image_id"]
    ok = out[out.image_id < 99]
    assert ok.decode_ok.all()
    assert (ok.width == 16).all() and (ok.height == 8).all()
    exp = imgs[0].reshape(-1, 3).mean(axis=0)
    assert abs(ok.loc[0, "mean_r"] - exp[0]) < 1e-9
    bad = out[out.image_id == 99].iloc[0]
    assert not bad.decode_ok and bad.width == 0


def test_video_frame_sampling():
    frames = [_img(i, w=4, h=4) for i in range(5)]
    raw = b"".join(encode_image_rgb8(f) for f in frames)
    sampled = decode_video_frames(raw, every_k=2)
    assert len(sampled) == 3  # frames 0, 2, 4
    assert np.array_equal(sampled[1], frames[2])
