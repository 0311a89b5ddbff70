"""EXIF metadata: PII detection and stripping for JPEG images.

The image-modality analog of the transcript scrub stage (D4): a
web-scraped photo's EXIF APP1 segment routinely carries GPS
coordinates, capture timestamps and device identifiers — exactly the
PII a training corpus must not retain. Both halves are implemented
from the public specs (JPEG marker stream, ITU-T T.81 §B; TIFF 6.0
IFD grammar; EXIF 2.3 tag ids):

- ``parse_exif``: walks the JPEG marker stream to the APP1 "Exif"
  segment, then the TIFF structure inside it (both byte orders,
  IFD0 → Exif/GPS sub-IFD pointers). Reports orientation, whether a
  capture DateTime exists, camera make/model, and — the PII flag —
  whether a GPS IFD with coordinate tags is present. Values stay
  unread beyond that: the pipeline's job is to FLAG and REMOVE, not
  to retain locations.
- ``strip_exif``: rewrites the JPEG with every APP1-Exif segment
  dropped (marker-stream copy, entropy-coded data untouched) — the
  decoded pixels are bit-identical, pytest-asserted.

A deterministic from-scratch EXIF writer builds spec-shaped fixtures
(proper IFD entry table + out-of-line value area, both sub-IFDs), so
tests need no camera files.

Spark contract: ``profile_exif`` (one mapInPandas pass, audit
columns only) and ``scrub_exif`` (same pass shape, rewritten bytes +
audit) — corrupt rows degrade to exif_present=false / passthrough.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXIF_HEADER = b"Exif\x00\x00"

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_GPS_LAT = 0x0002
_GPS_LON = 0x0004

EXIF_PROFILE_SCHEMA = (
    "exif_present boolean, orientation int, has_datetime boolean, "
    "has_gps boolean, make string, model string"
)


# --------------------------------------------------------------------------
# JPEG marker walk
# --------------------------------------------------------------------------
def _iter_segments(raw: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment up
    to and including SOS; seg bounds cover marker+length+payload."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            raise ValueError("JPEG: marker desync")
        marker = raw[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # no-payload markers
            yield marker, pos, pos + 2
            pos += 2
            continue
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        end = pos + 2 + length
        if end > n:
            raise ValueError("JPEG: segment overruns buffer")
        yield marker, pos, end
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return
        pos = end


def _find_exif_segment(raw: bytes) -> tuple[int, int] | None:
    for marker, s, e in _iter_segments(raw):
        if marker == 0xE1 and raw[s + 4 : s + 10] == EXIF_HEADER:
            return s, e
    return None


# --------------------------------------------------------------------------
# TIFF / IFD parsing
# --------------------------------------------------------------------------
def _parse_ifd(tiff: bytes, offset: int, bo: str) -> dict[int, tuple]:
    """→ {tag: (type, count, value_bytes_or_int)}; value is the raw
    inline u32 for pointer tags, decoded bytes for ASCII."""
    if offset + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset out of range")
    (n_entries,) = struct.unpack(bo + "H", tiff[offset : offset + 2])
    out: dict[int, tuple] = {}
    for i in range(n_entries):
        e = offset + 2 + 12 * i
        if e + 12 > len(tiff):
            raise ValueError("EXIF: IFD entry overruns")
        tag, typ, cnt = struct.unpack(bo + "HHI", tiff[e : e + 8])
        inline = tiff[e + 8 : e + 12]
        size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}.get(typ, 1) * cnt
        if size <= 4:
            vbytes = inline[:size]
        else:
            (voff,) = struct.unpack(bo + "I", inline)
            if voff + size > len(tiff):
                raise ValueError("EXIF: value overruns")
            vbytes = tiff[voff : voff + size]
        out[tag] = (typ, cnt, vbytes)
    return out


def _ascii(v: tuple | None) -> str | None:
    if v is None or v[0] != 2:
        return None
    return v[2].split(b"\x00", 1)[0].decode("ascii", errors="replace") or None


def parse_exif(raw: bytes) -> dict | None:
    """EXIF profile of a JPEG, or None when no Exif APP1 exists.
    Raises ValueError on malformed streams."""
    seg = _find_exif_segment(raw)
    if seg is None:
        return None
    tiff = raw[seg[0] + 10 : seg[1]]
    if len(tiff) < 8:
        raise ValueError("EXIF: TIFF header truncated")
    bo = {b"II": "<", b"MM": ">"}.get(tiff[:2])
    if bo is None:
        raise ValueError("EXIF: bad byte order")
    magic, ifd0_off = struct.unpack(bo + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    ifd0 = _parse_ifd(tiff, ifd0_off, bo)
    orientation = None
    if _TAG_ORIENTATION in ifd0 and ifd0[_TAG_ORIENTATION][0] == 3:
        (orientation,) = struct.unpack(bo + "H", ifd0[_TAG_ORIENTATION][2])
    has_gps = False
    if _TAG_GPS_IFD in ifd0:
        (gps_off,) = struct.unpack(bo + "I", ifd0[_TAG_GPS_IFD][2])
        gps = _parse_ifd(tiff, gps_off, bo)
        has_gps = _GPS_LAT in gps or _GPS_LON in gps
    return {
        "orientation": orientation,
        "has_datetime": _TAG_DATETIME in ifd0,
        "has_gps": has_gps,
        "make": _ascii(ifd0.get(_TAG_MAKE)),
        "model": _ascii(ifd0.get(_TAG_MODEL)),
    }


def strip_exif(raw: bytes) -> tuple[bytes, bool]:
    """→ (jpeg_without_exif, had_exif). Every APP1-Exif segment is
    dropped; all other segments and the entropy-coded stream are
    copied byte-identically."""
    out = bytearray(b"\xff\xd8")
    had = False
    last_end = 2
    for marker, s, e in _iter_segments(raw):
        if marker == 0xD8:
            continue
        if marker == 0xE1 and raw[s + 4 : s + 10] == EXIF_HEADER:
            had = True
            last_end = e
            continue
        out += raw[s:e]
        last_end = e
    out += raw[last_end:]  # entropy-coded data + EOI, verbatim
    return bytes(out), had


# --------------------------------------------------------------------------
# deterministic EXIF writer (fixtures)
# --------------------------------------------------------------------------
def _ifd_bytes(entries: list[tuple[int, int, int, bytes]], base: int) -> bytes:
    """entries = [(tag, type, count, payload)]; values > 4 bytes go to
    a data area after the entry table. ``base`` = offset of this IFD
    within the TIFF block."""
    entries = sorted(entries)
    table = struct.pack("<H", len(entries))
    data = b""
    data_off = base + 2 + 12 * len(entries) + 4  # after next-IFD pointer
    for tag, typ, cnt, payload in entries:
        if len(payload) <= 4:
            inline = payload + b"\x00" * (4 - len(payload))
        else:
            inline = struct.pack("<I", data_off + len(data))
            data += payload
        table += struct.pack("<HHI", tag, typ, cnt) + inline
    return table + struct.pack("<I", 0) + data


def build_exif_segment(
    make: str = "bdqc",
    model: str = "synthcam 1",
    orientation: int = 6,
    datetime: str = "2024:01:01 12:00:00",
    gps: tuple[float, float] | None = (48.85, 2.35),
) -> bytes:
    """A spec-shaped APP1 Exif segment (little-endian TIFF)."""

    def rational_triplet(deg: float) -> bytes:
        d = int(abs(deg))
        m = int((abs(deg) - d) * 60)
        s = int(round(((abs(deg) - d) * 60 - m) * 60 * 100))
        return struct.pack("<6I", d, 1, m, 1, s, 100)

    ifd0_entries = [
        (_TAG_MAKE, 2, len(make) + 1, make.encode() + b"\x00"),
        (_TAG_MODEL, 2, len(model) + 1, model.encode() + b"\x00"),
        (_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation)),
        (_TAG_DATETIME, 2, len(datetime) + 1, datetime.encode() + b"\x00"),
    ]
    gps_block = b""
    if gps is not None:
        # provisional ifd0 (with the pointer entry, value TBD) to
        # learn its total size including the out-of-line data area
        probe = _ifd_bytes(
            ifd0_entries + [(_TAG_GPS_IFD, 4, 1, struct.pack("<I", 0))], 8
        )
        gps_off = 8 + len(probe)
        lat, lon = gps
        gps_entries = [
            (0x0001, 2, 2, (b"N" if lat >= 0 else b"S") + b"\x00"),
            (_GPS_LAT, 5, 3, rational_triplet(lat)),
            (0x0003, 2, 2, (b"E" if lon >= 0 else b"W") + b"\x00"),
            (_GPS_LON, 5, 3, rational_triplet(lon)),
        ]
        gps_block = _ifd_bytes(gps_entries, gps_off)
        ifd0_entries.append((_TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_off)))
    tiff = b"II" + struct.pack("<HI", 42, 8) + _ifd_bytes(ifd0_entries, 8) + gps_block
    payload = EXIF_HEADER + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def inject_exif(jpeg: bytes, segment: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + segment + jpeg[2:]


# --------------------------------------------------------------------------
# Spark wrappers
# --------------------------------------------------------------------------
def _profile_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw in pdf["bytes"]:
            row = {"exif_present": False, "orientation": None,
                   "has_datetime": None, "has_gps": None, "make": None,
                   "model": None}
            if raw is not None:
                try:
                    p = parse_exif(bytes(raw))
                    if p is not None:
                        row.update(exif_present=True, **p)
                except ValueError:
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "bytes":
                out[keep] = pdf[keep].to_numpy()
        yield out


def profile_exif(images: DataFrame) -> DataFrame:
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in images.schema.fields
        if f.name != "bytes"
    )
    return images.mapInPandas(_profile_batches, f"{passthrough}, {EXIF_PROFILE_SCHEMA}")


def _scrub_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs, had = [], []
        for raw in pdf["bytes"]:
            if raw is None:
                outs.append(None)
                had.append(None)
                continue
            try:
                b, h = strip_exif(bytes(raw))
            except ValueError:
                b, h = bytes(raw), False  # non-JPEG / corrupt: passthrough
            outs.append(b)
            had.append(h)
        out = pdf.copy()
        out["bytes"] = outs
        out["exif_removed"] = had
        yield out


def scrub_exif(images: DataFrame) -> DataFrame:
    """Rewrite pass: bytes with every Exif APP1 dropped +
    ``exif_removed`` audit. Pixels are untouched (the entropy-coded
    stream is copied verbatim)."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields
    )
    return images.mapInPandas(_scrub_batches, f"{passthrough}, exif_removed boolean")
