"""Ring-1 tests for the from-scratch FLAC-subset wire codec.

FLAC is lossless, so the bar is exact int16 equality (not SNR).
No external FLAC implementation exists in this sandbox; the wire
evidence is (a) a hand-derived golden byte vector checked field by
field against the public spec, (b) CRC-8/CRC-16/MD5 integrity
verification catching any byte corruption, (c) exact round-trips
across subframe types, partition orders, and frame boundaries.
"""

from __future__ import annotations

import numpy as np
import pytest

from bdqc_spark.functions.flac import (
    flac_decode,
    flac_decode_i16,
    flac_encode,
    flac_info,
)


def _i16(x):
    return np.round(np.clip(np.asarray(x, np.float64), -1, 1) * 32767).astype(np.int16)


RNG = np.random.default_rng(7)
CASES = {
    "silence": np.zeros(9000, np.float32),
    "tone": (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 0.5).astype(np.float32),
    "noise": (RNG.standard_normal(5000) * 0.2).clip(-1, 1).astype(np.float32),
    "tiny": np.array([0.1, -0.2, 0.3], np.float32),
    "one_sample": np.array([0.5], np.float32),
    "ramp": np.linspace(-0.9, 0.9, 12345).astype(np.float32),
    "full_scale": np.array([1.0, -1.0] * 100, np.float32),
    "two_frames_plus": (RNG.standard_normal(2 * 4096 + 100) * 0.1).astype(np.float32),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_exact(name):
    x = CASES[name]
    dec, sr = flac_decode_i16(flac_encode(x, sr=16000))
    assert sr == 16000
    assert np.array_equal(dec, _i16(x)), name


@pytest.mark.parametrize(
    "kw",
    [{"force_verbatim": True}, {"partition_order": 2}, {"partition_order": 4}],
)
def test_roundtrip_variants(kw):
    x = CASES["tone"]
    dec, sr = flac_decode_i16(flac_encode(x, sr=8000, **kw))
    assert sr == 8000
    assert np.array_equal(dec, _i16(x)), kw


def test_escape_partition_roundtrip():
    """Spiky residuals make raw (escape) partitions cheaper than
    Rice for some partitions — exercise the escape encode + decode."""
    rng = np.random.default_rng(3)
    x = np.where(
        rng.random(8192) < 0.02, rng.uniform(-1, 1, 8192), rng.standard_normal(8192) * 5e-4
    ).astype(np.float32)
    dec, _ = flac_decode_i16(flac_encode(x, partition_order=4))
    assert np.array_equal(dec, _i16(x))


def test_compression_actually_compresses():
    """Tonal/smooth content must compress well below raw 16-bit —
    the codec is not a verbatim dressing."""
    tone = flac_encode(CASES["tone"])
    ramp = flac_encode(CASES["ramp"])
    assert len(tone) < 0.5 * 2 * len(CASES["tone"])
    assert len(ramp) < 0.2 * 2 * len(CASES["ramp"])


GOLDEN = bytes.fromhex(
    # hand-derived, field by field, from the public FLAC spec
    # (xiph.org/flac/format) for encode(zeros(2), sr=16000):
    #   664c6143          "fLaC"
    #   80 000022         last-metadata flag + STREAMINFO, length 34
    #   1000 1000         min/max blocksize 4096
    #   000000 000000     min/max framesize unknown
    #   03e80|0|0f|...02  sr=16000(20b) ch-1=0(3b) bps-1=15(5b) total=2(36b)
    #   f1d3...7262       md5(b"\x00\x00\x00\x00")
    #   fff8              sync(14)=0x3FFE reserved=0 blocking=fixed
    #   70                blocksize code 0b0111 (16-bit at end), sr code 0b0000
    #   08                channels 0b0000 (mono), sample size 0b100 (16), reserved 0
    #   00                UTF-8 frame number 0
    #   0001              blocksize-1 = 1
    #   1d                CRC-8 of header
    #   000000            subframe: pad 0, type 0b000000 CONSTANT, wasted 0, value 0 (16b)
    #   5605              CRC-16 of frame
    "664c6143800000221000100000000000000003e800f000000002"
    "f1d3ff8443297732862df21dc4e57262"
    "fff870080000011d0000005605"
)


def test_golden_stream_bytes():
    assert flac_encode(np.zeros(2, np.float32), sr=16000) == GOLDEN


def test_golden_stream_decodes():
    dec, sr = flac_decode_i16(GOLDEN)
    assert sr == 16000 and np.array_equal(dec, np.zeros(2, np.int16))


def test_info_fields():
    info = flac_info(flac_encode(CASES["ramp"], sr=22050))
    assert info["sr"] == 22050
    assert info["channels"] == 1
    assert info["bps"] == 16
    assert info["total_samples"] == len(CASES["ramp"])


def test_corruption_detected_everywhere():
    """Flipping any byte of the frame section must raise (CRC-8,
    CRC-16, rice/structure, or MD5 — nothing decodes silently)."""
    raw = bytearray(flac_encode(CASES["noise"], sr=16000))
    frame_start = 42  # 4 magic + 4 block header + 34 STREAMINFO
    rng = np.random.default_rng(11)
    hits = 0
    for pos in rng.choice(np.arange(frame_start, len(raw)), size=40, replace=False):
        bad = bytearray(raw)
        bad[pos] ^= 0x41
        try:
            flac_decode_i16(bytes(bad))
        except ValueError:
            hits += 1
    assert hits == 40


def test_md5_tamper_detected():
    raw = bytearray(flac_encode(CASES["tiny"]))
    raw[30] ^= 0xFF  # inside the STREAMINFO MD5 field
    with pytest.raises(ValueError, match="MD5|flac"):
        flac_decode_i16(bytes(raw))


def test_malformed_streams_rejected():
    with pytest.raises(ValueError):
        flac_decode_i16(b"fLaX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        flac_decode_i16(flac_encode(CASES["tone"])[:100])  # truncated
    with pytest.raises(ValueError):
        flac_encode(np.zeros(0, np.float32))


def test_profile_batch_integration():
    """codec='flac' rows flow through the vectorized profile stage:
    decoded stats must equal the pcm_s16le twin of the same signal."""
    import pandas as pd

    from bdqc_spark.functions.audio import encode, profile_batch

    x = CASES["tone"]
    raw = pd.Series([encode(x, "flac"), encode(x, "pcm_s16le"), b"notflac"])
    codec = pd.Series(["flac", "pcm_s16le", "flac"])
    sr = pd.Series([16000, 16000, 16000])
    out = profile_batch(raw, codec, sr)
    assert bool(out.loc[0, "pcm_ok"]) and bool(out.loc[1, "pcm_ok"])
    assert not bool(out.loc[2, "pcm_ok"])  # malformed degrades, not crashes
    assert abs(out.loc[0, "rms"] - out.loc[1, "rms"]) < 1e-6
    assert out.loc[0, "dur_ms_decoded"] == out.loc[1, "dur_ms_decoded"]


def test_decode_arrow_slice_parity():
    from bdqc_spark.functions.audio import decode, decode_arrow_slice

    raw = flac_encode(CASES["noise"])
    buf = np.frombuffer(b"\xaa" + raw + b"\xbb", dtype=np.uint8)
    a = decode_arrow_slice(buf, 1, 1 + len(raw), "flac")
    b = decode(raw, "flac")
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# LPC subframes (r4 VERDICT ask #6: the coding mode real encoders
# emit by default — decode must be bit-exact, not approximate)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("order", [1, 2, 4, 8, 12, 32])
def test_lpc_roundtrip_exact_all_orders(order):
    rng = np.random.default_rng(order)
    t = np.arange(16000) / 16000
    x = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 660 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).clip(-1, 1).astype(np.float32)
    raw = flac_encode(x, lpc_order=order, partition_order=2)
    dec, sr = flac_decode_i16(raw)
    assert np.array_equal(dec, _i16(x))
    assert sr == 16000


@pytest.mark.parametrize("name", list(CASES))
def test_lpc_roundtrip_exact_all_case_signals(name):
    x = CASES[name]
    raw = flac_encode(x, lpc_order=8)
    dec, _ = flac_decode_i16(raw)
    assert np.array_equal(dec, _i16(x)), name


def test_lpc_stream_really_contains_lpc_subframes():
    """The order-8 stream must not silently fall back to FIXED:
    find a frame whose subframe type code is 0b100000|(order-1)."""
    t = np.arange(8192) / 16000
    x = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    raw = flac_encode(x, lpc_order=8)
    from bdqc_spark.functions.flac import _Bits, _parse_stream_header

    data = np.frombuffer(raw, np.uint8)
    _, off = _parse_stream_header(data)
    br = _Bits(data[off:])
    assert br.read(14) == 0x3FFE  # first frame sync
    # skip to the subframe header: reserved+blocking(2) + bs/sr/ch/ss
    # codes(15) + utf8 frame number 0 (8) + 16-bit blocksize (16,
    # bs_code 0b0111) + crc8 (8) = 49 bits after sync
    br.read(2 + 4 + 4 + 4 + 3 + 1 + 8 + 16 + 8)
    assert br.read(1) == 0  # padding bit
    tcode = br.read(6)
    assert tcode == (0b100000 | 7), bin(tcode)  # LPC, order 8


def test_lpc_compresses_tonal_better_than_fixed():
    # tonal + noise floor: the regime where LPC beats the fixed
    # predictors (a NOISELESS sine is so smooth that order-4
    # differencing already wins — that is not the interesting case)
    rng = np.random.default_rng(21)
    t = np.arange(16000) / 16000
    x = (
        0.45 * np.sin(2 * np.pi * 247 * t)
        + 0.1 * np.sin(2 * np.pi * 494 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).clip(-1, 1).astype(np.float32)
    lpc = flac_encode(x, lpc_order=8, partition_order=2)
    fixed = flac_encode(x, partition_order=2)
    dec_l, _ = flac_decode_i16(lpc)
    dec_f, _ = flac_decode_i16(fixed)
    assert np.array_equal(dec_l, dec_f)  # identical samples either way
    assert len(lpc) < len(fixed)  # ...but LPC wins on tonal content


def test_lpc_corruption_detected():
    t = np.arange(8192) / 16000
    x = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    raw = bytearray(flac_encode(x, lpc_order=8))
    raw[len(raw) // 2] ^= 0x40  # flip a bit mid-frame
    with pytest.raises(ValueError):
        flac_decode_i16(bytes(raw))


def test_lpc_profile_batch_integration(spark):
    """A clips table whose FLAC bytes are LPC-coded flows through the
    real profile path (plans/profile.profile_clips) with pcm_ok=True
    and exact decoded duration."""
    from bdqc_spark.plans.profile import profile_clips

    t = np.arange(4800) / 16000
    x = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    raw = flac_encode(x, lpc_order=8)
    df = spark.createDataFrame(
        [("lpc-1", bytearray(raw), 16000, 300, "flac", "hi there")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    out = profile_clips(df).collect()
    assert len(out) == 1
    audio = out[0]["audio"]
    assert audio["pcm_ok"]
    assert audio["n_samples"] == 4800
    assert abs(audio["dur_ms_decoded"] - 300) <= 1


# ---------------------------------------------------------------------------
# stereo (r5 fourth session)
# ---------------------------------------------------------------------------
def _stereo_sig(n=12000, sr=16000, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    l = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(n)
    r = 0.4 * np.sin(2 * np.pi * 220 * t + 0.4) + 0.02 * rng.standard_normal(n)
    st = np.stack([l, r], axis=1).astype(np.float32)
    want = np.round(np.clip(st.astype(np.float64), -1, 1) * 32767).astype(np.int16)
    return st, want


def test_stereo_all_modes_round_trip_exact():
    """Every stereo channel assignment (independent, left/side,
    right/side, mid/side) round-trips bit-exactly under both FIXED
    and LPC subframes — including the side channel's 17-bit rule."""
    from bdqc_spark.functions.flac import flac_decode_channels_i16, flac_encode

    st, want = _stereo_sig()
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        for lpc in (0, 8):
            got, sr = flac_decode_channels_i16(
                flac_encode(st, stereo_mode=mode, lpc_order=lpc, partition_order=2)
            )
            assert sr == 16000
            assert np.array_equal(got, want), (mode, lpc)


def test_stereo_decorrelation_compresses_dual_mono():
    """Mid/side on near-identical channels beats independent coding —
    the property the decorrelated modes exist for (side ≈ 0)."""
    from bdqc_spark.functions.flac import flac_encode

    st, _ = _stereo_sig()
    dual = np.stack([st[:, 0], st[:, 0]], axis=1)  # identical channels
    ind = len(flac_encode(dual, stereo_mode="independent", lpc_order=8))
    ms = len(flac_encode(dual, stereo_mode="mid_side", lpc_order=8))
    assert ms < 0.7 * ind


def test_stereo_downmix_and_mono_api_contract():
    from bdqc_spark.functions.flac import (
        flac_decode,
        flac_decode_i16,
        flac_encode,
        flac_info,
    )

    st, want = _stereo_sig(n=5000)
    raw = flac_encode(st, stereo_mode="mid_side")
    assert flac_info(raw)["channels"] == 2
    f = flac_decode(raw)  # float downmix, same convention as WAV
    manual = (want.astype(np.float32) / 32767.0).mean(axis=1)
    assert f.shape == (5000,) and np.allclose(f, manual)
    with pytest.raises(ValueError, match="stereo"):
        flac_decode_i16(raw)
    with pytest.raises(ValueError, match="stereo_mode"):
        flac_encode(st, stereo_mode="surround")


def test_stereo_md5_covers_interleaved_pcm():
    """Corrupting one channel's sample fails the STREAMINFO MD5 (or
    an earlier CRC) — integrity covers the interleaved stream."""
    from bdqc_spark.functions.flac import flac_decode_channels_i16, flac_encode

    st, _ = _stereo_sig(n=3000)
    raw = bytearray(flac_encode(st, stereo_mode="independent", force_verbatim=True))
    raw[-40] ^= 0x10  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        flac_decode_channels_i16(bytes(raw))


def test_stereo_through_channel_qc(spark):
    """A phase-inverted stereo FLAC clip is caught by the channel QC
    (the downmix-cancellation case, now through the FLAC codec)."""
    from bdqc_spark.functions.channels import clips_channel_stats
    from bdqc_spark.functions.flac import flac_encode

    st, _ = _stereo_sig(n=8000)
    inv = np.stack([st[:, 0], -st[:, 0]], axis=1)
    rows = [
        ("stereo", bytearray(flac_encode(st, stereo_mode="mid_side")), "flac"),
        ("inverted", bytearray(flac_encode(inv, stereo_mode="mid_side")), "flac"),
        ("mono", bytearray(flac_encode(st[:, 0])), "flac"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r.clip_id: r.asDict() for r in clips_channel_stats(df).collect()}
    assert got["stereo"]["chan_ok"] and got["stereo"]["channels"] == 2
    assert got["inverted"]["phase_inverted"] is True
    assert got["inverted"]["downmix_loss_db"] > 40.0
    assert got["mono"]["channels"] == 1
