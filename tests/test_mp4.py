"""MP4 / ISO-BMFF container parser tests: writer↔parser metadata
round-trip (incl. largesize and version-1 fullbox variants),
strict truncation behavior, unknown-box skipping, size==0
box-to-EOF, and the Spark profile_mp4 integration contract."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.mp4 import (
    _box,
    build_test_mp4,
    parse_mp4,
    profile_mp4,
)


def test_roundtrip_metadata_exact():
    raw = build_test_mp4(
        width=64, height=48, fps=25, n_frames=50, sr=16000, channels=1,
        mdat_payload=b"\xab" * 300,
    )
    p = parse_mp4(raw)
    assert p["major_brand"] == "isom"
    assert p["timescale"] == 1000
    assert p["duration_ms"] == pytest.approx(2000.0)
    assert p["n_tracks"] == 2
    assert p["mdat_bytes"] == 300
    vid = next(t for t in p["tracks"] if t["handler"] == "vide")
    aud = next(t for t in p["tracks"] if t["handler"] == "soun")
    assert (vid["codec"], vid["width"], vid["height"]) == ("avc1", 64, 48)
    assert vid["n_samples"] == 50 and vid["fps"] == pytest.approx(25.0)
    assert (aud["codec"], aud["channels"], aud["sample_rate"]) == ("mp4a", 1, 16000)
    # 1024-sample packets over 2000 ms at 16 kHz
    assert aud["n_samples"] == 16000 * 2 // 1024


def test_largesize_and_version1_boxes():
    raw = build_test_mp4(
        large_mdat=True, mvhd_version=1, fps=30, n_frames=90,
        sr=44100, channels=2, video_codec=b"vp09", audio_codec=b"opus",
        mdat_payload=b"\x01" * 1000,
    )
    p = parse_mp4(raw)
    assert p["mdat_bytes"] == 1000  # largesize header accounted correctly
    assert p["duration_ms"] == pytest.approx(3000.0)
    vid = next(t for t in p["tracks"] if t["handler"] == "vide")
    aud = next(t for t in p["tracks"] if t["handler"] == "soun")
    assert vid["codec"] == "vp09" and vid["fps"] == pytest.approx(30.0)
    assert aud["codec"] == "opus" and aud["sample_rate"] == 44100 and aud["channels"] == 2


def test_truncation_is_an_error_not_a_partial_read():
    raw = build_test_mp4()
    for cut in (len(raw) - 1, len(raw) // 2, 13):
        with pytest.raises(ValueError):
            parse_mp4(raw[:cut])
    with pytest.raises(ValueError):
        parse_mp4(b"")
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 11)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        parse_mp4(b"garbagegarbagegarbage")
    # spec-shaped boxes but neither ftyp nor moov anywhere
    with pytest.raises(ValueError):
        parse_mp4(_box(b"free", b"\x00" * 16) + _box(b"skip", b"\x00" * 8))


def test_unknown_boxes_skipped_and_size0_to_eof():
    base = build_test_mp4()
    # unknown box injected between top-level boxes: ignored, not fatal
    raw = _box(b"free", b"\xee" * 31) + base
    p = parse_mp4(raw)
    assert p["n_tracks"] == 2
    # a trailing size==0 box legally extends to EOF
    tail = struct.pack(">I", 0) + b"skip" + b"\x07" * 123
    p2 = parse_mp4(base + tail)
    assert p2["n_tracks"] == 2 and p2["major_brand"] == "isom"


def test_inner_table_overrun_rejected():
    raw = bytearray(build_test_mp4())
    i = raw.find(b"stts")
    # inflate the declared stts entry_count past the box end
    struct.pack_into(">I", raw, i + 8, 10_000)
    with pytest.raises(ValueError):
        parse_mp4(bytes(raw))


def test_spark_profile_partitions_by_construction(spark):
    from bdqc_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    def gen(batches):
        from bdqc_spark.functions.mp4 import build_test_mp4 as bt

        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng([909, i])
                if i % 3 == 2:
                    # a lone valid mdat followed by random bytes: either the
                    # random tail fails the box walk or the file ends with
                    # neither ftyp nor moov — both are parse errors
                    raw = b"\x00\x00\x00\x10mdat" + bytes(
                        rng.integers(0, 256, 64).astype(np.uint8)
                    )
                else:
                    raw = bt(
                        width=16 * (1 + i % 4), height=16, fps=24 + (i % 2),
                        n_frames=24 + i, sr=8000 * (1 + i % 3), channels=1 + i % 2,
                        large_mdat=(i % 2 == 0), mvhd_version=i % 2,
                    )
                rows.append({"video_id": f"v-{i:05d}", "bytes": raw, "kind": i % 3})
            yield pd.DataFrame(rows)

    vids = spark.range(0, 48).repartition(4).mapInPandas(
        gen, "video_id string, bytes binary, kind int"
    )
    out = profile_mp4(vids).toPandas().sort_values("video_id").reset_index(drop=True)
    assert len(out) == 48
    assert (out["parse_ok"] == (out["kind"] < 2)).all()
    ok = out[out["parse_ok"]]
    assert (ok["major_brand"] == "isom").all()
    assert (ok["n_tracks"] == 2).all()
    assert (ok["video_codec"] == "avc1").all()
    # i%3==2 rows are the corrupt ones, so only sr for i%3 in {0,1} appears
    assert set(ok["sample_rate"]) == {8000, 16000}
    i = np.arange(48)
    exp_w = pd.Series(16 * (1 + i % 4), index=[f"v-{j:05d}" for j in i])
    got_w = ok.set_index("video_id")["width"]
    assert (got_w == exp_w.loc[got_w.index]).all()


def test_mvhd_zero_timescale_rejected():
    raw = bytearray(build_test_mp4())
    i = raw.find(b"mvhd")
    # fullbox v0: [size(4) 'mvhd'] then version/flags(4) ctime(4) mtime(4) timescale(4)
    struct.pack_into(">I", raw, i + 4 + 4 + 8, 0)
    with pytest.raises(ValueError):
        parse_mp4(bytes(raw))
