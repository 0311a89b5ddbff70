"""Audio container metadata PII strip (functions/audio_metadata.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.audio import decode, encode
from bdqc_spark.functions.audio_metadata import (
    add_flac_comments,
    add_wav_info,
    build_id3v2,
    parse_audio_metadata,
    profile_audio_metadata,
    scrub_audio_metadata,
    strip_audio_metadata,
)
from bdqc_spark.functions.containers import build_test_mp3, parse_mp3
from bdqc_spark.functions.flac import flac_encode

SR = 16000


@pytest.fixture(scope="module")
def pcm():
    t = np.arange(SR // 2) / SR
    return (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)


def test_wav_info_round_trip(pcm):
    plain = encode(pcm, "wav", SR)
    tagged = add_wav_info(
        plain, {"artist": "Jane Doe", "comment": "recorded at home", "date": "2024"}
    )
    p = parse_audio_metadata(tagged)
    assert p["container"] == "wav"
    assert p["tags"]["artist"] == "Jane Doe"
    assert p["tags"]["comment"] == "recorded at home"
    assert p["meta_bytes"] > 0
    stripped, removed = strip_audio_metadata(tagged)
    assert removed > 0
    assert parse_audio_metadata(stripped)["tags"] == {}
    np.testing.assert_array_equal(decode(stripped, "wav"), decode(tagged, "wav"))
    # clean input untouched byte-for-byte
    same, r0 = strip_audio_metadata(plain)
    assert r0 == 0 and same == plain


def test_mp3_id3_round_trip():
    plain = build_test_mp3(n_frames=12, id3_size=0)
    tagged = build_id3v2({"TPE1": "Jane Doe", "TIT2": "home recording"}) + plain
    tagged += b"TAG" + b"\x00" * 125  # ID3v1 trailer
    p = parse_audio_metadata(tagged)
    assert p["container"] == "mp3"
    assert p["tags"]["TPE1"] == "Jane Doe" and p["tags"]["id3v1"] == "present"
    stripped, removed = strip_audio_metadata(tagged)
    assert removed == len(tagged) - len(plain)
    assert stripped == plain
    # frame chain intact
    assert parse_mp3(stripped)["n_frames"] == 12


def test_flac_vorbis_comment_round_trip(pcm):
    plain = flac_encode(pcm, SR)
    tagged = add_flac_comments(plain, {"ARTIST": "Jane Doe", "LOCATION": "48.85,2.35"})
    p = parse_audio_metadata(tagged)
    assert p["container"] == "flac"
    assert p["tags"]["ARTIST"] == "Jane Doe" and p["tags"]["LOCATION"] == "48.85,2.35"
    stripped, removed = strip_audio_metadata(tagged)
    assert removed > 0
    assert parse_audio_metadata(stripped)["tags"] == {}
    # stream stays spec-valid and decodes bit-identically
    np.testing.assert_array_equal(decode(stripped, "flac"), decode(tagged, "flac"))
    assert stripped == plain  # comment block was the only difference


def test_unknown_container_raises():
    with pytest.raises(ValueError):
        parse_audio_metadata(b"\x00\x01\x02\x03 garbage")


def test_spark_profile_and_scrub(spark, pcm):
    wav_t = add_wav_info(encode(pcm, "wav", SR), {"artist": "Jane"})
    flac_t = add_flac_comments(flac_encode(pcm, SR), {"ARTIST": "Jane"})
    mp3_t = build_id3v2({"TPE1": "Jane"}) + build_test_mp3(n_frames=8, id3_size=0)
    clean = encode(pcm, "wav", SR)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "clip_id": ["wav", "flac", "mp3", "clean", "junk", "null"],
                "bytes": [wav_t, flac_t, mp3_t, clean, b"\x01\x02", None],
            }
        )
    )
    prof = profile_audio_metadata(df).toPandas().set_index("clip_id")
    for k in ("wav", "flac", "mp3"):
        assert prof.loc[k, "has_metadata"] and prof.loc[k, "container"] == k
    assert not prof.loc["clean", "has_metadata"]
    assert not prof.loc["junk", "has_metadata"] and prof.loc["junk", "container"] is None

    scr = scrub_audio_metadata(df).toPandas().set_index("clip_id")
    for k in ("wav", "flac", "mp3"):
        assert scr.loc[k, "meta_removed_bytes"] > 0
        assert parse_audio_metadata(bytes(scr.loc[k, "bytes"]))["tags"] == {}
    assert bytes(scr.loc["clean", "bytes"]) == clean
    assert bytes(scr.loc["junk", "bytes"]) == b"\x01\x02"


def test_ogg_opus_comment_round_trip():
    from bdqc_spark.functions.audio_metadata import add_ogg_comments
    from bdqc_spark.functions.containers import build_test_ogg_opus, parse_ogg

    plain = build_test_ogg_opus(channels=1, n_audio_pages=3)
    p0 = parse_audio_metadata(plain)
    assert p0["container"] == "ogg" and p0["tags"] == {}

    tagged = add_ogg_comments(plain, {"ARTIST": "Jane Doe", "LOCATION": "48.85,2.35"})
    # every page CRC must still verify after the surgery
    prof_t = parse_ogg(tagged)
    p = parse_audio_metadata(tagged)
    assert p["tags"]["ARTIST"] == "Jane Doe" and p["meta_bytes"] > 0

    stripped, removed = strip_audio_metadata(tagged)
    assert removed > 0
    assert parse_audio_metadata(stripped)["tags"] == {}
    # stream stays fully valid: page CRCs, page count, codec profile
    prof_s = parse_ogg(stripped)
    assert prof_s["n_pages"] == prof_t["n_pages"]
    assert prof_s["codec"] == "opus"
    assert prof_s["duration_ms"] == prof_t["duration_ms"]
    # the audio pages' bodies are untouched: strip(tagged) == plain
    assert stripped == plain
    # idempotent
    assert strip_audio_metadata(stripped) == (stripped, 0)


def test_ogg_multi_segment_comment_packet():
    """A comment packet spanning several 255-byte lacing segments
    (the writer never splits packets across pages; cross-page
    continuation is handled by the same reassembly loop) strips back
    to the plain stream."""
    from bdqc_spark.functions.audio_metadata import add_ogg_comments
    from bdqc_spark.functions.containers import build_test_ogg_opus, parse_ogg

    plain = build_test_ogg_opus(n_audio_pages=2)
    big = add_ogg_comments(plain, {"COMMENT": "x" * 700})  # > 2 lacing segments
    p = parse_audio_metadata(big)
    assert p["tags"]["COMMENT"] == "x" * 700
    stripped, removed = strip_audio_metadata(big)
    assert removed > 0 and stripped == plain
    assert parse_ogg(stripped)["codec"] == "opus"
