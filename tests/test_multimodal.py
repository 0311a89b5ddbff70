"""Multimodal tests: schema, batch flow, corrupt handling, and the
from-scratch PNG codec (real decoder; JPEG/video remain sandbox
stubs on the RGB8 debug format)."""

from __future__ import annotations

import numpy as np
import pytest
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

    # mp4-ish container: genuinely undecodable in this sandbox
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)
    # JPEG SOI with garbage body: decodable format (r5: from-scratch
    # baseline codec in functions/jpeg.py), corrupt file
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 64)
    # PNG signature with garbage body: decodable format, corrupt file
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_png_roundtrip_all_filters_and_color_types():
    """From-scratch PNG codec (VERDICT r3 #6): encoder applies one
    filter to every scanline; the decoder must invert all five
    reconstruction paths (None/Sub/Up/Average/Paeth), for RGB and
    RGBA, via an independent serial implementation."""
    from bdqc_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(9, 31, 4), dtype=np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(rgb, ft)), rgb), ft
        assert np.array_equal(decode_png(encode_png(rgba, ft)), rgba[:, :, :3]), ft
    # gradient image (smooth content — the regime Paeth/Average target)
    grad = (
        np.stack(np.meshgrid(np.arange(40), np.arange(30), indexing="ij"), -1).sum(-1) % 256
    )
    img = np.repeat(grad[:, :, None], 3, 2).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img, 4)), img)
    # 1x1 edge case
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(one, 1)), one)


def test_png_corruption_degrades():
    import pytest

    from bdqc_spark.functions.multimodal import decode_png, encode_png

    raw = bytearray(encode_png(_img(2)))
    raw[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(raw))
    with pytest.raises(ValueError):
        decode_png(encode_png(_img(2))[:30])  # truncated


def test_profile_images_decodes_real_png(spark):
    """PNG payloads flow through the same mapInPandas plumbing as RGB8
    and corrupt bytes; decode_ok rates reflect payload health."""
    from bdqc_spark.functions.multimodal import encode_png

    imgs = [_img(i, w=12, h=7) for i in range(4)]
    rows = [(i, bytearray(encode_png(img, filter_type=i % 5))) for i, img in enumerate(imgs)]
    rows.append((50, bytearray(encode_image_rgb8(_img(50)))))
    corrupt = bytearray(encode_png(_img(9)))
    corrupt[45] ^= 0x7F
    rows.append((99, corrupt))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes"]))
    out = profile_images(df).toPandas().set_index("image_id")
    assert out.loc[range(4), "decode_ok"].all()
    assert (out.loc[range(4), "width"] == 12).all()
    assert (out.loc[range(4), "height"] == 7).all()
    exp = imgs[0].reshape(-1, 3).mean(axis=0)
    assert abs(out.loc[0, "mean_g"] - exp[1]) < 1e-9
    assert out.loc[50, "decode_ok"]
    assert not out.loc[99, "decode_ok"]


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


def test_png_gray_and_palette_decode():
    import struct
    import zlib

    from bdqc_spark.functions.multimodal import PNG_SIG, decode_png

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data)
        )

    # 3x2 grayscale (color type 0), filter 0 rows
    gray = np.array([[0, 128, 255], [10, 20, 30]], dtype=np.uint8)
    idat = zlib.compress(b"\x00" + gray[0].tobytes() + b"\x00" + gray[1].tobytes())
    raw = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    out = decode_png(raw)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)

    # 2x2 palette (color type 3)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    idat = zlib.compress(b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes())
    raw = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    out = decode_png(raw)
    assert np.array_equal(out[0, 0], [255, 0, 0])
    assert np.array_equal(out[0, 1], [0, 255, 0])
    assert np.array_equal(out[1, 0], [0, 0, 255])


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — real wire-format uncompressed video
# --------------------------------------------------------------------------
def _y4m_frames(n=12, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (np.full((h, w), (20 * i) % 256, np.uint8) + rng.integers(0, 8, (h, w)).astype(np.uint8))
        for i in range(n)
    ]


def test_y4m_roundtrip_all_chroma_modes():
    from bdqc_spark.functions.multimodal import decode_y4m_frames, encode_y4m

    frames = _y4m_frames()
    for chroma in ("420jpeg", "420", "422", "444", "mono"):
        raw = encode_y4m(frames, fps=30.0, chroma=chroma)
        info, got = decode_y4m_frames(raw, every_k=1)
        assert info["n_frames"] == 12
        assert info["fps"] == 30.0
        assert info["chroma"] == chroma
        assert len(got) == 12
        assert all(np.array_equal(a, b) for a, b in zip(got, frames))


def test_y4m_frame_sampling_skips_bytes():
    from bdqc_spark.functions.multimodal import decode_y4m_frames, encode_y4m

    frames = _y4m_frames(n=20)
    raw = encode_y4m(frames)
    info, got = decode_y4m_frames(raw, every_k=7)
    assert len(got) == 3  # frames 0, 7, 14
    assert np.array_equal(got[1], frames[7])
    assert info["n_frames"] == 20


def test_y4m_header_is_interoperable_ascii():
    """The header must be the exact mjpegtools token layout any
    third-party Y4M reader parses."""
    from bdqc_spark.functions.multimodal import encode_y4m

    raw = encode_y4m(_y4m_frames(n=1), fps=29.97, chroma="420jpeg")
    head = raw.split(b"\n", 1)[0].decode()
    toks = head.split(" ")
    assert toks[0] == "YUV4MPEG2"
    assert "W64" in toks and "H48" in toks
    assert any(t.startswith("F29970:1000") for t in toks)
    assert "C420jpeg" in toks


def test_y4m_malformed_degrades():
    from bdqc_spark.functions.multimodal import decode_y4m_frames, encode_y4m

    raw = encode_y4m(_y4m_frames())
    for bad in (b"", b"JUNK" + raw, raw[:40], raw[:-5], raw.replace(b"FRAME", b"FRAMX", 1)):
        with pytest.raises(ValueError):
            decode_y4m_frames(bad)


def test_profile_videos_spark(spark):
    from bdqc_spark.functions.multimodal import encode_y4m, profile_videos

    static = encode_y4m([_y4m_frames(n=1)[0]] * 10, fps=25.0)  # no motion
    moving = encode_y4m(_y4m_frames(n=10, seed=3), fps=25.0)
    rows = [
        ("static", static),
        ("moving", moving),
        ("corrupt", b"YUV4MPEG2 W0 H0\nFRAME\n"),
        ("null", None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["video_id", "bytes"]))
    out = profile_videos(df).toPandas().set_index("video_id")
    assert bool(out.loc["static", "decode_ok"]) and bool(out.loc["moving", "decode_ok"])
    assert not bool(out.loc["corrupt", "decode_ok"])
    assert not bool(out.loc["null", "decode_ok"])
    assert out.loc["static", "n_frames"] == 10
    assert out.loc["static", "width"] == 64 and out.loc["static", "height"] == 48
    # sampled every 5th of 10 frames → 2 sampled
    assert out.loc["static", "sampled_frames"] == 2
    assert out.loc["static", "motion"] == 0.0
    assert out.loc["moving", "motion"] > 5.0


# -- bilinear resize (the brief's multimodal "resize" op) ------------------


def test_resize_bilinear_identity_and_flat():
    from bdqc_spark.functions.multimodal import resize_bilinear

    img = _img(5, w=20, h=10)
    assert resize_bilinear(img, 10, 20) is img  # identity exact
    flat = np.full((8, 8, 3), 77, np.uint8)
    out = resize_bilinear(flat, 5, 13)
    assert out.shape == (5, 13, 3)
    assert (out == 77).all()  # constant image stays constant at any size


def test_resize_bilinear_gradient_values():
    """A linear horizontal ramp must stay (approximately) linear under
    bilinear resampling — interior values match the analytic ramp."""
    from bdqc_spark.functions.multimodal import resize_bilinear

    w = 64
    ramp = np.tile(np.arange(w, dtype=np.uint8) * 4, (8, 1))
    img = np.stack([ramp] * 3, axis=-1)
    out = resize_bilinear(img, 8, 32).astype(np.float64)
    # centers: src_x = (dst + .5)*2 - .5 → value = 4*src_x
    want = 4.0 * ((np.arange(32) + 0.5) * 2 - 0.5)
    got = out[4, :, 0]
    assert np.abs(got[1:-1] - want[1:-1]).max() <= 1.0


def test_resize_bilinear_rejects_bad_size():
    import pytest as _pytest

    from bdqc_spark.functions.multimodal import resize_bilinear

    with _pytest.raises(ValueError):
        resize_bilinear(_img(1), 0, 4)


def test_resize_images_spark(spark):
    import pandas as pd

    from bdqc_spark.functions.multimodal import (
        decode_png,
        encode_png,
        resize_images,
    )

    rows = [
        ("a", encode_png(_img(1, w=32, h=16))),
        ("b", encode_image_rgb8(_img(2, w=10, h=10))),
        ("c", b"\x89PNG....garbage"),
        ("d", None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes"]))
    out = resize_images(df, height=8, width=12).toPandas().set_index("image_id")
    assert bool(out.loc["a", "resize_ok"]) and bool(out.loc["b", "resize_ok"])
    assert not out.loc["c", "resize_ok"] and not out.loc["d", "resize_ok"]
    assert out.loc["c", "bytes"] is None
    for k in ("a", "b"):
        dec = decode_png(bytes(out.loc[k, "bytes"]))
        assert dec.shape == (8, 12, 3)
    # deterministic: resizing twice yields identical PNG bytes
    again = resize_images(df, height=8, width=12).toPandas().set_index("image_id")
    assert bytes(again.loc["a", "bytes"]) == bytes(out.loc["a", "bytes"])


def test_resize_bilinear_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bdqc_spark.functions.multimodal import resize_bilinear

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        oh=st.integers(1, 24),
        ow=st.integers(1, 24),
        seed=st.integers(0, 2**16),
    )
    def prop(h, w, oh, ow, seed):
        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)
        out = resize_bilinear(img, oh, ow)
        assert out.shape == (oh, ow, 3)
        assert out.dtype == np.uint8
        # bilinear output is bounded by input range (no ringing)
        assert out.min() >= img.min() and out.max() <= img.max()

    prop()
