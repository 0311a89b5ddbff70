"""WebM/Matroska EBML container parser (functions/webm.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from bdqc_spark.functions.webm import (
    build_test_webm,
    parse_webm,
    profile_webm,
)


def test_round_trip_all_fields():
    raw = build_test_webm(
        width=1920, height=1080, sample_rate=44100.0, channels=2,
        duration_ms=2500.0, n_clusters=3,
    )
    p = parse_webm(raw)
    assert p["doc_type"] == "webm" and p["doc_type_version"] == 4
    assert p["timestamp_scale"] == 1_000_000
    assert p["duration_ms"] == pytest.approx(2500.0)
    assert p["n_tracks"] == 2 and p["n_clusters"] == 3 and p["cluster_bytes"] > 0
    vid = next(t for t in p["tracks"] if t["type"] == 1)
    aud = next(t for t in p["tracks"] if t["type"] == 2)
    assert (vid["codec"], vid["width"], vid["height"]) == ("V_VP9", 1920, 1080)
    assert aud["codec"] == "A_OPUS" and aud["channels"] == 2
    assert aud["sample_rate"] == pytest.approx(44100.0)


def test_unknown_size_segment_and_float32_duration():
    raw = build_test_webm(unknown_size_segment=True, float32_duration=True, duration_ms=800.0)
    p = parse_webm(raw)
    assert p["duration_ms"] == pytest.approx(800.0, rel=1e-6)
    assert p["n_tracks"] == 2


def test_matroska_doctype_and_single_track_variants():
    p = parse_webm(build_test_webm(doc_type="matroska", audio=False))
    assert p["doc_type"] == "matroska"
    assert [t["type"] for t in p["tracks"]] == [1]
    p = parse_webm(build_test_webm(video=False))
    assert [t["type"] for t in p["tracks"]] == [2]


def test_nondefault_timestamp_scale():
    # a muxer writing 100 µs ticks: Duration units change, ms must not
    raw = build_test_webm(duration_ms=1500.0, timestamp_scale=100_000)
    p = parse_webm(raw)
    assert p["timestamp_scale"] == 100_000
    assert p["duration_ms"] == pytest.approx(1500.0)


def test_truncation_and_garbage_raise():
    raw = build_test_webm()
    for cut in (3, 10, len(raw) // 2, len(raw) - 1):
        with pytest.raises(ValueError):
            parse_webm(raw[:cut])
    with pytest.raises(ValueError):
        parse_webm(b"\x00" * 40)
    with pytest.raises(ValueError):
        parse_webm(b"\x1aE\xdf\xa3" + b"\xff" * 20)  # header with junk body


def test_unknown_size_only_for_streamable_masters():
    # hand-build: an Info element with an unknown-size VINT is illegal
    from bdqc_spark.functions.webm import _el, _enc_id, _EBML, _DOCTYPE, _SEGMENT, _INFO

    header = _el(_EBML, _el(_DOCTYPE, b"webm"))
    bad_info = _enc_id(_INFO) + b"\xff" + b"\x00" * 4
    raw = header + _el(_SEGMENT, bad_info)
    with pytest.raises(ValueError, match="unknown size"):
        parse_webm(raw)


def test_spark_profile_and_corrupt_degradation(spark):
    rows = [
        ("ok-1", build_test_webm(width=640, height=360)),
        ("ok-2", build_test_webm(doc_type="matroska", n_clusters=1)),
        ("bad-1", build_test_webm()[:-7]),  # truncated mid-cluster
        ("bad-2", b"\x1aE\xdf\xa3junkjunkjunk"),
        ("null", None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["file_id", "bytes"]))
    out = profile_webm(df).toPandas().set_index("file_id")
    assert bool(out.loc["ok-1", "parse_ok"]) and out.loc["ok-1", "width"] == 640
    assert out.loc["ok-2", "doc_type"] == "matroska"
    assert not bool(out.loc["bad-1", "parse_ok"])
    assert not bool(out.loc["bad-2", "parse_ok"])
    assert not bool(out.loc["null", "parse_ok"])
    assert "bytes" not in out.columns


def test_sniffer_dispatch():
    from bdqc_spark.functions.containers import sniff_media

    s = sniff_media(build_test_webm(width=320, height=240, channels=1))
    assert s["format"] == "webm" and s["codec"] == "V_VP9"
    assert (s["width"], s["height"], s["channels"]) == (320, 240, 1)
    assert s["sample_rate"] == 48000
