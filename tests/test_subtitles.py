"""SRT/WebVTT cue parsing + timed-transcript QC
(functions/subtitles.py): writer↔parser round-trip, format edge
cases (hourless VTT stamps, NOTE blocks, cue ids, BOM), planted
structural anomalies recovered exactly, Spark batch contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.subtitles import (
    build_srt,
    build_vtt,
    cue_qc,
    parse_srt,
    parse_vtt,
    subtitle_qc,
)

CUES = [
    {"start_ms": 0, "end_ms": 1500, "text": "hello there"},
    {"start_ms": 1600, "end_ms": 3000, "text": "general kenobi"},
    {"start_ms": 3100, "end_ms": 4200, "text": "a third line"},
]


def test_roundtrip_srt_and_vtt():
    for build, parse in ((build_srt, parse_srt), (build_vtt, parse_vtt)):
        got, bad = parse(build(CUES))
        assert bad == 0
        assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
            (c["start_ms"], c["end_ms"], c["text"]) for c in CUES
        ]


def test_vtt_edge_cases():
    v = (
        "﻿WEBVTT\n\nNOTE a comment\nmore comment\n\n"
        "intro-cue-id\n00:05.000 --> 00:07.250 align:start\nshort form\n\n"
        "01:00:00.000 --> 01:00:01.000\nwith hours\n"
    )
    cues, bad = parse_vtt(v)
    assert bad == 0 and len(cues) == 2
    assert cues[0]["start_ms"] == 5000 and cues[0]["end_ms"] == 7250
    assert cues[1]["start_ms"] == 3600000


def test_srt_malformed_block_counted_not_fatal():
    srt = build_srt(CUES) + "\n\nnot a cue\nstill not\n"
    cues, bad = parse_srt(srt)
    assert len(cues) == 3 and bad == 1
    with pytest.raises(ValueError):
        parse_srt("complete garbage, no cues at all")
    with pytest.raises(ValueError):
        parse_vtt("missing header\n\n00:05.000 --> 00:07.000\nx\n")


def test_cue_qc_planted_anomalies():
    cues = [
        {"start_ms": 0, "end_ms": 1000, "text": "ok cue"},
        {"start_ms": 900, "end_ms": 2000, "text": "overlaps by 100"},
        {"start_ms": 2500, "end_ms": 2500, "text": "zero duration"},
        {"start_ms": 3000, "end_ms": 3200, "text": "x" * 200},  # 1000 cps
        {"start_ms": 5000, "end_ms": 7000, "text": "past the end"},
    ]
    qc = cue_qc(cues, clip_dur_ms=4000)
    assert qc["n_cues"] == 5
    assert qc["n_invalid"] == 1
    assert qc["n_overlap"] == 1 and qc["overlap_ms"] == 100
    assert qc["n_out_of_bounds"] == 1
    assert qc["max_cps"] == pytest.approx(1000.0)
    assert qc["speech_ms"] == 1000 + 1100 + 200 + 2000
    # speech exceeds the clip duration here (out-of-bounds cue): the
    # coverage ratio caps at 1.0 by design
    assert qc["coverage"] == 1.0


def test_cue_qc_no_duration_given():
    qc = cue_qc(CUES)
    assert qc["coverage"] is None and qc["n_out_of_bounds"] is None
    assert qc["n_overlap"] == 0 and qc["median_gap_ms"] == 100.0


def test_spark_subtitle_qc(spark):
    from bdqc_spark.shipping import ensure_shipped

    ensure_shipped(spark)

    def gen(batches):
        from bdqc_spark.functions.subtitles import build_srt as bs, build_vtt as bv

        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = i % 4
                base = [
                    {"start_ms": 0, "end_ms": 1200, "text": f"cue one {i}"},
                    {"start_ms": 1300, "end_ms": 2600, "text": "cue two"},
                ]
                if kind == 0:
                    sub = bs(base)
                elif kind == 1:
                    sub = bv(base)
                elif kind == 2:  # planted overlap
                    base[1]["start_ms"] = 1100
                    sub = bs(base)
                else:  # unparseable
                    sub = "no cues here at all"
                rows.append(
                    {"clip_id": f"c-{i:04d}", "subtitle": sub,
                     "dur_ms": 3000, "kind": kind}
                )
            yield pd.DataFrame(rows)

    files = spark.range(0, 48).repartition(4).mapInPandas(
        gen, "clip_id string, subtitle string, dur_ms int, kind int"
    )
    out = subtitle_qc(files).toPandas().sort_values("clip_id")
    assert len(out) == 48
    assert (out["sub_ok"] == (out["kind"] < 3)).all()
    ok = out[out["sub_ok"]]
    assert (ok["n_cues"] == 2).all()
    assert (ok[ok["kind"] == 0]["sub_format"] == "srt").all()
    assert (ok[ok["kind"] == 1]["sub_format"] == "vtt").all()
    assert (ok[ok["kind"] == 2]["n_overlap"] == 1).all()
    assert (ok[ok["kind"] == 2]["overlap_ms"] == 100).all()
    assert (ok[ok["kind"] < 2]["n_overlap"] == 0).all()
    assert np.allclose(ok[ok["kind"] < 2]["coverage"], (1200 + 1300) / 3000)
    # the overlap variant starts cue two earlier → more speech time
    assert np.allclose(ok[ok["kind"] == 2]["coverage"], (1200 + 1500) / 3000)
