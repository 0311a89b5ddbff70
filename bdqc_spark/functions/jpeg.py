"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Same role as the FLAC codec in functions/flac.py: a real, dependency-
free (stdlib + numpy) implementation of the wire format so the image
profiling path (`functions/multimodal.py`) decodes actual JPEG bytes
instead of stubbing — the container has no PIL/libjpeg.

Scope (exactly baseline sequential DCT, the format >90% of real-world
JPEGs use):
- decoder: SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/EOI marker parse,
  canonical Huffman entropy decode with 0xFF00 byte unstuffing and
  RSTn restart handling, dequantize + dezigzag, orthonormal 8×8
  IDCT (JPEG's 1/4·c(u)c(v) normalization IS the orthonormal DCT-II,
  so one precomputed basis matrix serves both directions exactly),
  per-component nearest-neighbor chroma upsampling (4:4:4 / 4:2:2 /
  4:2:0), BT.601 YCbCr→RGB. Progressive (SOF2) and arithmetic coding
  raise NotImplementedError — callers map any raise to
  decode_ok=False.
- encoder: deterministic baseline writer (Annex K quantization +
  Huffman tables, IJG quality scaling) used to synthesize test
  fixtures; supports grayscale, 4:4:4 and 4:2:0.

Reference semantics per bdqc's image signature plugin (SURVEY.md §2
A6: binary signature → typed decode, reconstructed Perl path
lib/BDQC/FileSignature/Image.pm — reference mount is empty); format
per the public T.81 spec, tables from its Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# natural index of the k-th coefficient in zigzag order (T.81 fig. 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 quantization tables (natural order, row-major)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis T (T @ T.T == I). JPEG's
    forward transform S(u,v) = 1/4 c(u)c(v) ΣΣ s·cos·cos equals
    T @ block @ T.T exactly (a0 = 1/(2√2) = √(1/8), au = 1/2)."""
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0) / 2.0
    t[0, :] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_basis()


def fdct2(block: np.ndarray) -> np.ndarray:
    """8×8 spatial (level-shifted) → JPEG DCT coefficients."""
    return _T @ block @ _T.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """JPEG DCT coefficients → 8×8 spatial (still level-shifted)."""
    return _T.T @ coef @ _T


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jpeg_quality_scaling): Q<50 →
    5000/Q, else 200-2Q percent; clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huff_decode(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG Huffman codes → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) for the same canonical assignment."""
    return {sym: (code, ln) for (ln, code), sym in _build_huff_decode(bits, vals).items()}


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy-coded segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t received bits to the signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(br, dc_tab, ac_tab, qtab_zig: np.ndarray, pred: int):
    """One 8×8 block → (natural-order dequantized coeffs, new DC pred)."""
    zig = np.zeros(64, dtype=np.int64)
    t = _huff_decode(br, dc_tab)
    diff = _extend(br.receive(t), t)
    pred += diff
    zig[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zig[k] = _extend(br.receive(s), s)
        k += 1
    nat = np.zeros(64, dtype=np.int64)
    nat[ZIGZAG] = zig * qtab_zig
    return nat.reshape(8, 8), pred


def _split_entropy(raw: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from `start` → list of unstuffed restart
    segments + index of the terminating marker's 0xFF."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = raw[i + 1]
        if m == 0x00:  # stuffed data byte
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:
            return [bytes(s) for s in segs], i
    return [bytes(s) for s in segs], n


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB.

    Raises ValueError on malformed streams and NotImplementedError on
    unsupported-but-valid features (progressive/arithmetic/12-bit) —
    the two types the row-degradation contract catches. Corrupted
    entropy/header state has too many failure surfaces to police
    individually (fuzzing surfaced IndexError/KeyError/OverflowError/
    StopIteration/ZeroDivisionError/struct.error escaping), so the
    decode body is normalized here at the boundary: any accidental
    exception type becomes ValueError instead of killing a Spark task.
    """
    try:
        return _decode_jpeg_checked(raw)
    except (ValueError, NotImplementedError):
        raise
    except (
        IndexError,
        KeyError,
        OverflowError,
        StopIteration,
        ZeroDivisionError,
        struct.error,
        MemoryError,
    ) as e:
        raise ValueError(f"jpeg: malformed stream ({type(e).__name__})") from e


_MAX_PIXELS = 1 << 26  # 64 Mpx: cap corrupt SOF dims before allocation


def _decode_jpeg_checked(raw: bytes) -> np.ndarray:
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}  # id → zigzag-order table
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    i = 2
    n = len(raw)
    while i < n:
        if raw[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        while i < n and raw[i] == 0xFF:  # fill bytes allowed
            i += 1
        if i >= n:
            raise ValueError("truncated JPEG")
        marker = raw[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > n:
            raise ValueError("truncated segment header")
        seg_len = struct.unpack(">H", raw[i : i + 2])[0]
        seg = raw[i + 2 : i + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment body")
        i += seg_len
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    qtables[tq] = np.frombuffer(seg[j : j + 64], np.uint8).astype(np.int64)
                    j += 64
                else:  # 16-bit precision
                    qtables[tq] = np.frombuffer(seg[j : j + 128], ">u2").astype(np.int64)
                    j += 128
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _build_huff_decode(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both Huffman sequential)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if h == 0 or w == 0 or h * w > _MAX_PIXELS:
                raise ValueError(f"jpeg: unreasonable dimensions {h}x{w}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("jpeg: invalid sampling factors")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/arithmetic/lossless JPEG")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": tda >> 4, "ta": tda & 0x0F})
            if ns != len(frame["comps"]):
                raise NotImplementedError("multi-scan baseline not supported")
            segs, i = _split_entropy(raw, i)
            return _decode_scan(frame, scan, qtables, huff, segs, restart_interval)
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qtables, huff, segs, restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64) for c in scan
    ]
    qz = [qtables[c["tq"]] for c in scan]  # stored in zigzag order
    preds = [0] * len(scan)
    seg_idx = 0
    br = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m > 0 and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(scan):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeffs, preds[ci] = _decode_block(
                        br, huff[(0, c["td"])], huff[(1, c["ta"])], qz[ci], preds[ci]
                    )
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = idct2(coeffs.astype(np.float64))
    # level-unshift, upsample to full resolution, crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (test-fixture synthesis; deterministic baseline writer)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, low bits) per T.81 table 5."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(bw, nat_q: np.ndarray, dc_enc, ac_enc, pred: int) -> int:
    zig = nat_q.ravel()[ZIGZAG]
    diff = int(zig[0]) - pred
    s, bits = _magnitude(diff)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    for k in range(1, 64):
        v = int(zig[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return int(zig[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JPEG bytes.

    Deterministic: fixed Annex K tables scaled by `quality`, fixed
    Huffman tables, no optimization passes. subsampling: '444' or
    '420' (ignored for grayscale)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = scaled_quant(QUANT_LUMA, quality)
    qc = scaled_quant(QUANT_CHROMA, quality)

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        planes = [img.astype(np.float64) - 128.0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
            # pad to even dims (edge-replicate), then 2×2 box mean
            ev = lambda p: np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), "edge")
            cbp, crp = ev(cb), ev(cr)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        elif subsampling == "444":
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0},
                {"id": 2, "h": 1, "v": 1, "tq": 1},
                {"id": 3, "h": 1, "v": 1, "tq": 1},
            ]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for c, p in zip(comps, planes):
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge"))

    dc_l, ac_l = _build_huff_encode(*DC_LUMA), _build_huff_encode(*AC_LUMA)
    dc_c, ac_c = _build_huff_encode(*DC_CHROMA), _build_huff_encode(*AC_CHROMA)
    qnat = [ql, qc]

    bw = _BitWriter()
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dce, ace = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            q = qnat[c["tq"]].reshape(8, 8)
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    coef = np.round(fdct2(blk) / q).astype(np.int64)
                    preds[ci] = _encode_block(bw, coef, dce, ace, preds[ci])
    data = bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc.ravel()[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)

    def dht(tc, th, spec):
        bits, vals = spec
        return _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    out += dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
    if not gray:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        sos += bytes([c["id"], 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (fixed for baseline)
    out += _seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"
    return bytes(out)
