"""Adversarial byte fuzz over every from-scratch parser: random
blobs, truncations of valid payloads at every depth, and single-byte
corruptions must either parse or raise ValueError — never an
IndexError / struct.error / KeyError / OverflowError escaping from
bounds arithmetic. This is the contract the mapInArrow/mapInPandas
passes rely on (`except (ValueError, TypeError)` → honest
ok=false rows): any other exception type kills the whole Spark task
instead of degrading one row."""

from __future__ import annotations

import numpy as np
import pytest

SEED = 20260819
N_RANDOM = 40
N_TRUNC = 25
N_FLIP = 25

# Exceptions the row-degradation contracts catch. zlib.error and
# UnicodeDecodeError are ValueError subclasses; NotImplementedError is
# the documented unsupported-feature signal (progressive JPEG,
# compressed video samples) that the image/video callers catch
# alongside ValueError.
ALLOWED = (ValueError, TypeError, NotImplementedError)


def _sig(n=4000, sr=16000):
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def _img(h=24, w=32):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _parsers():
    """(name, parse_fn, valid_payload_bytes) triples."""
    from bdqc_spark.functions import audio
    from bdqc_spark.functions.audio_metadata import (
        parse_audio_metadata,
        strip_audio_metadata,
    )
    from bdqc_spark.functions.containers import (
        build_test_mp3,
        build_test_ogg_opus,
        parse_mp3,
        parse_ogg,
        sniff_media,
    )
    from bdqc_spark.functions.exif import parse_exif, strip_exif
    from bdqc_spark.functions.flac import flac_decode_channels_i16, flac_info
    from bdqc_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from bdqc_spark.functions.mp4 import build_test_mp4, parse_mp4
    from bdqc_spark.functions.multimodal import decode_image, decode_png, encode_png
    from bdqc_spark.functions.webm import build_test_webm, parse_webm

    sig = _sig()
    wav = audio.encode_wav(sig, 16000, inner="pcm_s16le")
    flac = audio.encode(sig, "flac")
    png = encode_png(_img())
    jpg = encode_jpeg(_img(), quality=80)
    ogg = build_test_ogg_opus()
    mp3 = build_test_mp3()
    mp4 = build_test_mp4()
    webm = build_test_webm()

    out = [
        ("wav_decode", lambda b: audio.decode(b, "wav"), wav),
        ("wav_info", audio.wav_info, wav),
        ("flac_decode", flac_decode_channels_i16, flac),
        ("flac_info", flac_info, flac),
        ("png", decode_png, png),
        ("jpeg", decode_jpeg, jpg),
        ("image_sniff", decode_image, png),
        ("ogg", parse_ogg, ogg),
        ("mp3", parse_mp3, mp3),
        ("mp4", parse_mp4, mp4),
        ("webm", parse_webm, webm),
        ("media_sniff", sniff_media, ogg),
        ("exif_parse", parse_exif, jpg),
        ("exif_strip", strip_exif, jpg),
        ("audio_meta_parse", parse_audio_metadata, wav),
        ("audio_meta_strip", strip_audio_metadata, wav),
    ]
    return out


def _check(fn, payload: bytes, ctx: str):
    try:
        fn(payload)
    except ALLOWED:
        pass
    except Exception as e:  # noqa: BLE001 — the point of the test
        raise AssertionError(
            f"{ctx}: {type(e).__name__} escaped ({e!r}) — parsers must "
            "raise ValueError so Spark rows degrade instead of tasks dying"
        ) from e


@pytest.mark.parametrize("name,fn,valid", _parsers(), ids=lambda v: v if isinstance(v, str) else "")
def test_parser_survives_adversarial_bytes(name, fn, valid):
    rng = np.random.default_rng(SEED + hash(name) % 10_000)
    # the valid payload itself parses
    fn(valid)
    # pure random blobs (including empty)
    for i in range(N_RANDOM):
        n = int(rng.integers(0, 2000))
        _check(fn, rng.integers(0, 256, n, dtype=np.uint8).tobytes(), f"{name} random[{i}] len={n}")
    # truncations at evenly spaced depths
    for i in range(N_TRUNC):
        cut = int(len(valid) * (i + 1) / (N_TRUNC + 1))
        _check(fn, valid[:cut], f"{name} trunc@{cut}")
    # single-byte corruptions at random offsets
    for i in range(N_FLIP):
        off = int(rng.integers(0, len(valid)))
        bad = bytearray(valid)
        bad[off] ^= int(rng.integers(1, 256))
        _check(fn, bytes(bad), f"{name} flip@{off}")


def test_text_parsers_survive_garbage():
    """SRT/VTT/mojibake take str, not bytes: random printable +
    random unicode must parse or ValueError."""
    from bdqc_spark.functions.mojibake import fix_mojibake
    from bdqc_spark.functions.subtitles import parse_srt, parse_vtt

    rng = np.random.default_rng(SEED)
    for fn in (parse_srt, parse_vtt, fix_mojibake):
        for i in range(60):
            n = int(rng.integers(0, 500))
            s = "".join(chr(int(c)) for c in rng.integers(32, 0x2FF, n))
            try:
                fn(s)
            except ALLOWED:
                pass
