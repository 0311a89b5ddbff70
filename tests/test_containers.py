"""Audio container profilers (functions/containers.py): Ogg page
grammar + real Ogg CRC, Opus/Vorbis id headers, MP3 frame-header
chain walk (CBR/VBR/Xing/ID3), and the unified media sniffer
dispatching across every format the engine understands."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.containers import (
    _ogg_page,
    build_test_mp3,
    build_test_ogg_opus,
    ogg_crc,
    parse_mp3,
    parse_ogg,
    profile_media,
    sniff_media,
)


# --------------------------------------------------------------------------
# Ogg
# --------------------------------------------------------------------------
def test_ogg_opus_roundtrip_and_duration():
    raw = build_test_ogg_opus(
        channels=2, input_rate=48000, pre_skip=312,
        n_audio_pages=5, packets_per_page=3, samples_per_packet=960,
    )
    p = parse_ogg(raw)
    assert p["codec"] == "opus" and p["channels"] == 2
    assert p["sample_rate"] == 48000
    assert p["n_pages"] == 7  # BOS + tags + 5 audio
    # granule runs at 48 kHz: 5*3*960 samples = 300 ms after pre-skip
    assert p["duration_ms"] == pytest.approx(300.0)


def test_ogg_crc_is_not_zlib():
    import zlib

    data = b"OggS test vector 0123456789"
    assert ogg_crc(data) != (zlib.crc32(data) & 0xFFFFFFFF)
    # a known property: crc of empty input with init 0 is 0
    assert ogg_crc(b"") == 0


def test_ogg_corruption_caught_by_crc():
    raw = bytearray(build_test_ogg_opus())
    raw[60] ^= 0x01  # flip one payload bit
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(raw))


def test_ogg_truncation_rejected():
    raw = build_test_ogg_opus()
    for cut in (len(raw) - 3, len(raw) // 2, 10):
        with pytest.raises(ValueError):
            parse_ogg(raw[:cut])


def test_ogg_vorbis_id_header():
    ident = b"\x01vorbis" + struct.pack("<IBI", 0, 1, 22050) + b"\x00" * 12
    page0 = _ogg_page(5, 0, 0, [ident], header_type=0x02)
    page1 = _ogg_page(5, 1, 44100, [b"\x05" * 10], header_type=0x04)
    p = parse_ogg(page0 + page1)
    assert p["codec"] == "vorbis" and p["channels"] == 1
    assert p["sample_rate"] == 22050
    assert p["duration_ms"] == pytest.approx(2000.0)  # 44100 granule / 22050 sr


# --------------------------------------------------------------------------
# MP3
# --------------------------------------------------------------------------
def test_mp3_cbr_chain():
    m = parse_mp3(build_test_mp3(n_frames=30, bitrate_idx=9, sr_idx=0, mpeg1=True))
    assert m["n_frames"] == 30 and not m["vbr"]
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["bitrate_kbps"] == 128
    assert m["duration_ms"] == pytest.approx(30 * 1152 / 44100 * 1000)


def test_mp3_vbr_id3_xing_mpeg2():
    m = parse_mp3(
        build_test_mp3(
            n_frames=20, sr_idx=1, mpeg1=False, mono=True,
            id3_size=64, xing=True, vbr_pattern=(5, 9, 12),
        )
    )
    assert m["vbr"] and m["xing_frames"] == 20
    assert m["sample_rate"] == 24000 and m["channels"] == 1
    # MPEG-2: 576-sample frames
    assert m["duration_ms"] == pytest.approx(20 * 576 / 24000 * 1000)


def test_mp3_garbage_rejected_truncated_tail_tolerated():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_mp3(b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\x00" * 30)
    raw = build_test_mp3(n_frames=10)
    m = parse_mp3(raw[: len(raw) - 50])  # torn download: last frame cut
    assert m["n_frames"] == 9


# --------------------------------------------------------------------------
# sniffer
# --------------------------------------------------------------------------
def _fixture_payloads():
    from bdqc_spark.functions.audio import encode
    from bdqc_spark.functions.flac import flac_encode
    from bdqc_spark.functions.jpeg import encode_jpeg
    from bdqc_spark.functions.mp4 import build_test_mp4
    from bdqc_spark.functions.multimodal import encode_png, encode_y4m

    pcm = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    img = np.zeros((10, 12, 3), np.uint8)
    img[..., 1] = 200
    frames = [np.zeros((16, 16), np.uint8) for _ in range(3)]
    return {
        "wav": encode(pcm, "wav", 16000),
        "flac": flac_encode(pcm, 16000),
        "ogg": build_test_ogg_opus(),
        "mp3": build_test_mp3(),
        "png": encode_png(img),
        "jpeg": encode_jpeg(img, quality=90),
        "mp4": build_test_mp4(),
        "y4m": encode_y4m(frames, fps=25),
    }


def test_sniffer_dispatches_every_known_format():
    for want, payload in _fixture_payloads().items():
        got = sniff_media(payload)
        assert got["format"] == want, (want, got)
    wav = sniff_media(_fixture_payloads()["wav"])
    assert wav["sample_rate"] == 16000 and wav["duration_ms"] == pytest.approx(1000.0)


def test_sniffer_rejects_unknown():
    with pytest.raises(ValueError):
        sniff_media(b"\x00" * 100)
    with pytest.raises(ValueError):
        sniff_media(b"ab")


def test_spark_profile_media_mixed_bag(spark):
    from bdqc_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    kinds = ["wav", "flac", "ogg", "mp3", "png", "jpeg", "mp4", "y4m", "corrupt"]

    def gen(batches):
        from bdqc_spark.functions.audio import encode
        from bdqc_spark.functions.containers import (
            build_test_mp3 as bm3,
            build_test_ogg_opus as bogg,
        )
        from bdqc_spark.functions.flac import flac_encode
        from bdqc_spark.functions.jpeg import encode_jpeg
        from bdqc_spark.functions.mp4 import build_test_mp4 as bmp4
        from bdqc_spark.functions.multimodal import encode_png, encode_y4m

        pcm = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(
            np.float32
        )
        img = np.zeros((8, 8, 3), np.uint8)
        img[..., 0] = 150
        y4m_frames = [np.zeros((16, 16), np.uint8)]
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = kinds[i % len(kinds)]
                rng = np.random.default_rng([321, i])
                payload = {
                    "wav": lambda: encode(pcm, "wav", 16000),
                    "flac": lambda: flac_encode(pcm, 16000),
                    "ogg": lambda: bogg(channels=1 + i % 2),
                    "mp3": lambda: bm3(n_frames=10 + i % 5),
                    "png": lambda: encode_png(img),
                    "jpeg": lambda: encode_jpeg(img, quality=85),
                    "mp4": lambda: bmp4(width=32, height=32),
                    "y4m": lambda: encode_y4m(y4m_frames, fps=30),
                    "corrupt": lambda: bytes(
                        rng.integers(1, 255, 48).astype(np.uint8)
                    ),
                }[kind]()
                rows.append({"file_id": f"f-{i:04d}", "bytes": payload, "kind": kind})
            yield pd.DataFrame(rows)

    files = spark.range(0, 54).repartition(4).mapInPandas(
        gen, "file_id string, bytes binary, kind string"
    )
    out = profile_media(files).toPandas()
    assert len(out) == 54
    good = out[out["kind"] != "corrupt"]
    assert good["parse_ok"].all()
    assert (good["format"] == good["kind"]).all()
    bad = out[out["kind"] == "corrupt"]
    # random bytes virtually never start with a valid magic; assert none did
    assert not bad["parse_ok"].any()
