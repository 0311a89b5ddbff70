"""From-scratch baseline JPEG codec (functions/jpeg.py).

Verification strategy (no PIL/libjpeg in the container to cross-
check against):
- the DCT basis is checked against the literal T.81 double-sum
  definition, not just its own inverse;
- the DECODER is checked against a hand-assembled golden JPEG built
  in this file straight from spec constants (markers, canonical
  Huffman codes, quant tables) — fully independent of the encoder;
- encoder↔decoder round trips check exactness on pure-DC images and
  PSNR bounds on gradients for 4:4:4 / 4:2:0 / grayscale;
- corruption/truncation/unsupported-coding paths degrade to raises
  (→ decode_ok=False in the Spark profile), never wrong pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bdqc_spark.functions.jpeg import (
    AC_LUMA,
    DC_LUMA,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _build_huff_decode,
    _build_huff_encode,
    _split_entropy,
    decode_jpeg,
    encode_jpeg,
    fdct2,
    idct2,
    scaled_quant,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10.0 * np.log10(255.0**2 / max((err**2).mean(), 1e-12))


# ---------------------------------------------------------------------------
# transform layer
# ---------------------------------------------------------------------------
def test_dct_matches_t81_double_sum_definition():
    """fdct2 must equal S(v,u) = 1/4 C(v)C(u) ΣΣ s(y,x)·cos·cos from
    the spec, computed here the slow literal way."""
    rng = np.random.default_rng(7)
    s = rng.uniform(-128, 127, (8, 8))
    ref = np.zeros((8, 8))
    for v in range(8):
        for u in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += (
                        s[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[v, u] = 0.25 * cu * cv * acc
    assert np.allclose(fdct2(s), ref, atol=1e-9)
    assert np.allclose(idct2(ref), s, atol=1e-9)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: first diagonal and last entries
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-4:].tolist() == [47, 55, 62, 63]


def test_quality_scaling_ijg():
    # Q=50 is the identity on Annex K tables
    assert (scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()
    # Q=100 → all ones (lossless-est baseline)
    assert (scaled_quant(QUANT_LUMA, 100) == 1).all()
    assert (scaled_quant(QUANT_CHROMA, 100) == 1).all()
    # lower quality → coarser everywhere
    assert (scaled_quant(QUANT_LUMA, 10) >= scaled_quant(QUANT_LUMA, 90)).all()


def test_huffman_tables_canonical_and_consistent():
    dec = _build_huff_decode(*AC_LUMA)
    enc = _build_huff_encode(*AC_LUMA)
    assert len(dec) == 162  # Annex K luminance AC symbol count
    # encode table and decode table are inverses
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym
    # canonical prefix property: no code is a prefix of a longer one
    codes = sorted(((ln, code) for (ln, code) in dec), key=lambda t: t[0])
    for i, (l1, c1) in enumerate(codes):
        for l2, c2 in codes[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1, "prefix violation"


# ---------------------------------------------------------------------------
# decoder vs hand-assembled golden bytes (encoder-independent)
# ---------------------------------------------------------------------------
def _golden_gray128_8x8() -> bytes:
    """Hand-built minimal baseline JPEG: one 8×8 grayscale block of
    constant 128. Level shift → all-zero samples → every DCT coeff 0
    → DC category 0 + EOB. With Annex K tables the canonical codes
    are: DC symbol 0 → '00' (length 2); AC EOB (0x00, 4th value,
    after 2 codes of len 2 and 1 of len 3) → '1010' (length 4).
    Bitstream '00'+'1010' padded with 1s → 0b00101011 = 0x2B."""
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qz = bytes(QUANT_LUMA[ZIGZAG].astype(np.uint8))
    out += seg(0xDB, bytes([0x00]) + qz)  # DQT id 0
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))  # SOF0
    dc_bits, dc_vals = DC_LUMA
    ac_bits, ac_vals = AC_LUMA
    out += seg(0xC4, bytes([0x00] + dc_bits + dc_vals))  # DHT DC 0
    out += seg(0xC4, bytes([0x10] + ac_bits + ac_vals))  # DHT AC 0
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bytes([0x2B])  # entropy-coded data (hand-computed above)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def test_decoder_against_hand_assembled_golden():
    img = decode_jpeg(_golden_gray128_8x8())
    assert img.shape == (8, 8, 3)
    assert (img == 128).all()


def test_golden_with_nonzero_dc():
    """Same hand assembly, but DC diff = +2 (category 2, bits '10').
    Stream: DC sym 2 → '011'; value bits '10'; EOB '1010' →
    '011'+'10'+'1010' = 9 bits → 0b01110101, 0b0_1111111 pad →
    0x75, 0x7F. Dequantized DC = 2·16 = 32 → idct flat 32/8 = 4 →
    pixel 132."""
    raw = bytearray(_golden_gray128_8x8())
    raw[-3:-2] = bytes([0x75, 0x7F])  # replace the 1-byte scan
    img = decode_jpeg(bytes(raw))
    assert img.shape == (8, 8, 3)
    assert (img == 132).all()


# ---------------------------------------------------------------------------
# encoder ↔ decoder round trips
# ---------------------------------------------------------------------------
def test_solid_colors_roundtrip_exact():
    for color in ((0, 0, 0), (255, 255, 255), (200, 60, 90)):
        img = np.zeros((24, 40, 3), np.uint8)
        img[:] = color
        for sub in ("444", "420"):
            dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
            assert dec.shape == img.shape
            assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1, (color, sub)


def test_grayscale_roundtrip():
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (33, 47)) // 32 * 32 + 16).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (33, 47, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert _psnr(dec[..., 0], img) > 30.0


@pytest.mark.parametrize("sub,min_psnr", [("444", 40.0), ("420", 33.0)])
def test_gradient_roundtrip_psnr(sub, min_psnr):
    h, w = 37, 53  # deliberately not MCU-aligned
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > min_psnr


def test_quality_monotonicity():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p25 = _psnr(decode_jpeg(encode_jpeg(img, quality=25)), img)
    p95 = _psnr(decode_jpeg(encode_jpeg(img, quality=95)), img)
    assert p95 > p25
    assert len(encode_jpeg(img, quality=25)) < len(encode_jpeg(img, quality=95))


def test_deterministic_encoding():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


# ---------------------------------------------------------------------------
# entropy-segment mechanics and failure paths
# ---------------------------------------------------------------------------
def test_split_entropy_unstuffs_and_splits_restarts():
    data = bytes([0x12, 0xFF, 0x00, 0x34]) + bytes([0xFF, 0xD0]) + bytes([0x56]) + bytes(
        [0xFF, 0xD9]
    )
    segs, end = _split_entropy(data, 0)
    assert segs == [bytes([0x12, 0xFF, 0x34]), bytes([0x56])]
    assert data[end : end + 2] == b"\xff\xd9"


def test_corrupt_and_unsupported_inputs_raise():
    img = np.full((16, 16, 3), 90, np.uint8)
    raw = encode_jpeg(img, quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg(raw[: len(raw) // 2])  # truncated mid-stream
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)  # pretend progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


def test_bit_corruption_never_returns_silently_wrong_dimensions():
    """Flipping entropy bytes may decode to garbage pixels or raise —
    but if it returns, the geometry must still be the header's."""
    img = np.full((24, 24, 3), 120, np.uint8)
    raw = bytearray(encode_jpeg(img, quality=85))
    sos = bytes(raw).find(b"\xff\xda")
    for off in (sos + 20, sos + 24):
        bad = bytearray(raw)
        if bad[off] not in (0xFF, 0x00) and bad[off - 1] != 0xFF:
            bad[off] ^= 0x5A
            try:
                dec = decode_jpeg(bytes(bad))
                assert dec.shape == (24, 24, 3)
            except (ValueError, NotImplementedError):
                pass  # raising is the expected degradation


# ---------------------------------------------------------------------------
# Spark integration: the image profile path decodes real JPEG bytes
# ---------------------------------------------------------------------------
def test_profile_images_decodes_jpeg(spark):
    from bdqc_spark.functions.multimodal import profile_images

    red = np.zeros((16, 16, 3), np.uint8)
    red[..., 0] = 220
    blue = np.zeros((12, 20, 3), np.uint8)
    blue[..., 2] = 200
    rows = [
        ("jpg_red", bytearray(encode_jpeg(red, quality=90, subsampling="444"))),
        ("jpg_blue_420", bytearray(encode_jpeg(blue, quality=90, subsampling="420"))),
        ("corrupt", bytearray(b"\xff\xd8\x00garbage")),
        ("empty", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in profile_images(df).collect()}
    assert got["jpg_red"]["decode_ok"] and got["jpg_red"]["width"] == 16
    assert got["jpg_red"]["mean_r"] > 200 and got["jpg_red"]["mean_b"] < 30
    assert got["jpg_blue_420"]["decode_ok"] and got["jpg_blue_420"]["height"] == 12
    assert got["jpg_blue_420"]["mean_b"] > 180
    assert not got["corrupt"]["decode_ok"]
    assert not got["empty"]["decode_ok"]


def _golden_two_mcu_with_restart() -> bytes:
    """Hand-built 8×16 grayscale baseline JPEG with DRI=1 and an RST0
    between its two MCUs — exercises the restart path (segment switch,
    byte realignment, DC-predictor reset) that the deterministic
    encoder never emits. MCU0 = solid 128 (all-zero coeffs: '00' DC +
    '1010' EOB → 0x2B padded). After RST0 the DC predictor resets, so
    MCU1 = solid 132 encodes diff +2 from zero: '011'+'10'+'1010' →
    0x75 0x7F padded (see test_golden_with_nonzero_dc for the code
    derivation)."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out += seg(0xDB, bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dc_bits, dc_vals = DC_LUMA
    ac_bits, ac_vals = AC_LUMA
    out += seg(0xC4, bytes([0x00] + dc_bits + dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits + ac_vals))
    out += seg(0xDD, struct.pack(">H", 1))  # DRI: restart every 1 MCU
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0x2B])          # MCU0
    out += b"\xff\xd0"            # RST0 (byte-aligned, resets DC pred)
    out += bytes([0x75, 0x7F])    # MCU1
    out += b"\xff\xd9"
    return bytes(out)


def test_decoder_restart_markers_reset_dc_predictor():
    img = decode_jpeg(_golden_two_mcu_with_restart())
    assert img.shape == (8, 16, 3)
    assert (img[:, :8] == 128).all()   # first MCU
    assert (img[:, 8:] == 132).all()   # second MCU, predictor reset


def test_missing_restart_segment_raises():
    raw = bytearray(_golden_two_mcu_with_restart())
    # drop the RST0 marker: the decoder must fail loudly, not decode
    # MCU1 against a stale predictor from a mis-aligned stream
    i = bytes(raw).find(b"\xff\xd0")
    del raw[i : i + 2]
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(raw))
