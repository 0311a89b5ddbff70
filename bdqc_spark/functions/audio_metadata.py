"""Audio container metadata: PII detection and stripping.

The audio-modality analog of the transcript scrub (D4) and the image
EXIF strip: recorder software and taggers embed artist/device names,
timestamps, comments and location strings in the CONTAINER, outside
the PCM — WAV ``LIST/INFO`` chunks (RIFF spec), MP3 ID3v2 frames and
the ID3v1 trailer (id3.org), FLAC ``VORBIS_COMMENT`` blocks (xiph).
A clip-level QC pipeline must be able to (a) flag which clips carry
such metadata and (b) rewrite them without it, leaving the audio
payload bit-identical.

Implemented from the public specs, per container:
- **WAV**: RIFF chunk walk; ``LIST`` chunks of type ``INFO`` (IART/
  INAM/ICMT/ICRD/ISFT/IGNR/... sub-chunks) and embedded ``id3 ``
  chunks are parsed (keys + values) and removed; the RIFF size field
  is rewritten; ``fmt ``/``data``/``fact`` are untouched.
- **MP3**: ID3v2 header (syncsafe size; v2.3 plain / v2.4 syncsafe
  frame sizes, text-frame decoding for the common TIT2/TPE1/TALB/
  TYER/TDRC/COMM ids) and the fixed 128-byte ID3v1 ``TAG`` trailer;
  strip removes both, the frame chain is untouched.
- **FLAC**: metadata-block walk (1-byte last-flag|type + 24-bit
  length); ``VORBIS_COMMENT`` (type 4) key=value pairs are parsed and
  the block removed, with the last-block flag re-set on the new final
  block so the stream stays spec-valid; audio frames untouched.

Spark contract mirrors the EXIF pass: ``profile_audio_metadata`` and
``scrub_audio_metadata`` are one mapInPandas pass each; corrupt or
unknown payloads degrade to has_metadata=false / passthrough.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

AUDIO_META_SCHEMA = (
    "container string, has_metadata boolean, n_tags int, "
    "meta_bytes int, tag_keys string, artifacts string"
)

_INFO_KEYS = {
    b"IART": "artist", b"INAM": "title", b"ICMT": "comment",
    b"ICRD": "date", b"ISFT": "software", b"IGNR": "genre",
    b"ICOP": "copyright", b"IENG": "engineer",
}


# --------------------------------------------------------------------------
# WAV LIST/INFO
# --------------------------------------------------------------------------
def _wav_chunks(raw: bytes):
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    o, n = 12, len(raw)
    while o + 8 <= n:
        cid = raw[o : o + 4]
        (csz,) = struct.unpack("<I", raw[o + 4 : o + 8])
        body = o + 8
        if body + csz > n:
            raise ValueError("wav chunk overruns payload")
        yield cid, o, body, body + csz
        o = body + csz + (csz & 1)


def _parse_wav_meta(raw: bytes) -> tuple[dict, int]:
    tags: dict[str, str] = {}
    meta_bytes = 0
    for cid, start, body, end in _wav_chunks(raw):
        if cid == b"LIST" and raw[body : body + 4] == b"INFO":
            meta_bytes += end - start
            p = body + 4
            while p + 8 <= end:
                sub = raw[p : p + 4]
                (ssz,) = struct.unpack("<I", raw[p + 4 : p + 8])
                if p + 8 + ssz > end:
                    break
                val = raw[p + 8 : p + 8 + ssz].split(b"\x00", 1)[0]
                key = _INFO_KEYS.get(sub, sub.decode("ascii", errors="replace"))
                tags[key] = val.decode("utf-8", errors="replace")
                p += 8 + ssz + (ssz & 1)
        elif cid == b"id3 ":
            meta_bytes += end - start
            tags.setdefault("id3_chunk", "present")
    return tags, meta_bytes


def _strip_wav(raw: bytes) -> bytes:
    kept = bytearray()
    for cid, start, body, end in _wav_chunks(raw):
        if cid == b"id3 " or (cid == b"LIST" and raw[body : body + 4] == b"INFO"):
            continue
        csz = end - body
        kept += raw[start:end]
        if csz & 1:  # preserve the pad byte convention
            kept += b"\x00"
    out = b"RIFF" + struct.pack("<I", len(kept) + 4) + b"WAVE" + bytes(kept)
    return out


# --------------------------------------------------------------------------
# MP3 ID3v2 / ID3v1
# --------------------------------------------------------------------------
def _syncsafe(b: bytes) -> int:
    v = 0
    for x in b:
        v = (v << 7) | (x & 0x7F)
    return v


def _parse_id3v2(raw: bytes) -> tuple[dict, int]:
    if not raw.startswith(b"ID3") or len(raw) < 10:
        return {}, 0
    version = raw[3]
    size = _syncsafe(raw[6:10])
    end = min(10 + size, len(raw))
    tags: dict[str, str] = {}
    p = 10
    while p + 10 <= end:
        fid = raw[p : p + 4]
        if fid == b"\x00\x00\x00\x00":
            break
        fsz = _syncsafe(raw[p + 4 : p + 8]) if version >= 4 else struct.unpack(
            ">I", raw[p + 4 : p + 8]
        )[0]
        body = raw[p + 10 : p + 10 + fsz]
        if fid[:1] == b"T" and len(body) >= 1:
            enc = body[0]
            txt = body[1:]
            try:
                val = (
                    txt.decode("utf-16") if enc in (1, 2) else txt.decode(
                        "utf-8" if enc == 3 else "latin-1"
                    )
                ).strip("\x00")
            except UnicodeDecodeError:
                val = ""
            tags[fid.decode("ascii", errors="replace")] = val
        elif fid == b"COMM":
            tags["COMM"] = "present"
        p += 10 + fsz
    return tags, 10 + size


def _parse_mp3_meta(raw: bytes) -> tuple[dict, int]:
    tags, meta = _parse_id3v2(raw)
    if len(raw) >= 128 and raw[-128:-125] == b"TAG":
        tags["id3v1"] = "present"
        meta += 128
    return tags, meta


def _strip_mp3(raw: bytes) -> bytes:
    out = raw
    if out.startswith(b"ID3") and len(out) >= 10:
        out = out[10 + _syncsafe(out[6:10]) :]
    if len(out) >= 128 and out[-128:-125] == b"TAG":
        out = out[:-128]
    return out


# --------------------------------------------------------------------------
# FLAC VORBIS_COMMENT
# --------------------------------------------------------------------------
def _flac_blocks(raw: bytes):
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC")
    o, n = 4, len(raw)
    while True:
        if o + 4 > n:
            raise ValueError("flac: truncated metadata")
        hdr = raw[o]
        blen = int.from_bytes(raw[o + 1 : o + 4], "big")
        if o + 4 + blen > n:
            raise ValueError("flac: metadata block overruns stream")
        yield hdr & 0x7F, o, o + 4 + blen
        o += 4 + blen
        if hdr & 0x80:
            return o


def _parse_flac_meta(raw: bytes) -> tuple[dict, int]:
    tags: dict[str, str] = {}
    meta = 0
    gen = _flac_blocks(raw)
    while True:
        try:
            btype, s, e = next(gen)
        except StopIteration:
            break
        if btype != 4:
            continue
        meta += e - s
        b = raw[s + 4 : e]
        try:
            (vlen,) = struct.unpack("<I", b[:4])
            p = 4 + vlen
            (n_c,) = struct.unpack("<I", b[p : p + 4])
            p += 4
            for _ in range(n_c):
                (clen,) = struct.unpack("<I", b[p : p + 4])
                item = b[p + 4 : p + 4 + clen].decode("utf-8", errors="replace")
                p += 4 + clen
                if "=" in item:
                    k, v = item.split("=", 1)
                    tags[k.upper()] = v
        except (struct.error, IndexError):
            tags.setdefault("VORBIS_COMMENT", "unparsed")
    return tags, meta


def _strip_flac(raw: bytes) -> bytes:
    blocks = []
    gen = _flac_blocks(raw)
    audio_off = None
    while True:
        try:
            btype, s, e = next(gen)
        except StopIteration as stop:
            audio_off = stop.value
            break
        if btype != 4:
            blocks.append((btype, raw[s + 4 : e]))
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out.append(last | btype)
        out += len(body).to_bytes(3, "big")
        out += body
    return bytes(out) + raw[audio_off:]


def add_flac_comments(raw: bytes, tags: dict[str, str], vendor: str = "bdqc") -> bytes:
    """Fixture helper: insert a VORBIS_COMMENT block after STREAMINFO."""
    body = struct.pack("<I", len(vendor)) + vendor.encode()
    body += struct.pack("<I", len(tags))
    for k, v in tags.items():
        item = f"{k}={v}".encode()
        body += struct.pack("<I", len(item)) + item
    blocks = []
    gen = _flac_blocks(raw)
    audio_off = None
    while True:
        try:
            btype, s, e = next(gen)
        except StopIteration as stop:
            audio_off = stop.value
            break
        blocks.append((btype, raw[s + 4 : e]))
    blocks.insert(1, (4, bytes(body)))
    out = bytearray(b"fLaC")
    for i, (btype, b) in enumerate(blocks):
        out.append((0x80 if i == len(blocks) - 1 else 0) | btype)
        out += len(b).to_bytes(3, "big")
        out += b
    return bytes(out) + raw[audio_off:]


def add_wav_info(raw: bytes, tags: dict[str, str]) -> bytes:
    """Fixture helper: append a LIST/INFO chunk to a WAV."""
    rev = {v: k for k, v in _INFO_KEYS.items()}
    body = bytearray(b"INFO")
    for k, v in tags.items():
        cid = rev.get(k, k.encode("ascii")[:4].ljust(4, b" "))
        val = v.encode() + b"\x00"
        body += cid + struct.pack("<I", len(val)) + val
        if len(val) & 1:
            body += b"\x00"
    chunk = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    out = raw + chunk
    return b"RIFF" + struct.pack("<I", len(out) - 8) + b"WAVE" + out[12:]


def build_id3v2(tags: dict[str, str]) -> bytes:
    """Fixture helper: minimal ID3v2.3 tag block."""
    frames = bytearray()
    for fid, val in tags.items():
        body = b"\x00" + val.encode("latin-1")
        frames += fid.encode("ascii") + struct.pack(">I", len(body)) + b"\x00\x00" + body
    size = len(frames)
    ss = [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    return b"ID3" + bytes([3, 0, 0] + ss) + bytes(frames)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------
def parse_audio_metadata(raw: bytes) -> dict:
    """→ {container, tags, meta_bytes}; ValueError for unknown
    payloads."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        tags, meta = _parse_wav_meta(raw)
        return {"container": "wav", "tags": tags, "meta_bytes": meta}
    if raw[:4] == b"fLaC":
        tags, meta = _parse_flac_meta(raw)
        return {"container": "flac", "tags": tags, "meta_bytes": meta}
    if raw[:4] == b"OggS":
        tags, meta = _parse_ogg_meta(raw)
        return {"container": "ogg", "tags": tags, "meta_bytes": meta}
    if raw.startswith(b"ID3") or (
        len(raw) >= 2 and raw[0] == 0xFF and (raw[1] & 0xE0) == 0xE0
    ):
        tags, meta = _parse_mp3_meta(raw)
        return {"container": "mp3", "tags": tags, "meta_bytes": meta}
    raise ValueError("unknown audio container")


def strip_audio_metadata(raw: bytes) -> tuple[bytes, int]:
    """→ (stripped_bytes, bytes_removed). Audio payload untouched."""
    p = parse_audio_metadata(raw)
    if p["meta_bytes"] == 0 and not p["tags"]:
        return raw, 0
    out = {
        "wav": _strip_wav, "flac": _strip_flac,
        "mp3": _strip_mp3, "ogg": _strip_ogg,
    }[p["container"]](raw)
    return out, len(raw) - len(out)


# --------------------------------------------------------------------------
# Spark wrappers
# --------------------------------------------------------------------------
def _profile_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw in pdf["bytes"]:
            row = {"container": None, "has_metadata": False, "n_tags": 0,
                   "meta_bytes": 0, "tag_keys": None, "artifacts": None}
            if raw is not None:
                try:
                    p = parse_audio_metadata(bytes(raw))
                    keys = sorted(p["tags"])
                    row.update(
                        container=p["container"],
                        has_metadata=bool(p["tags"]) or p["meta_bytes"] > 0,
                        n_tags=len(p["tags"]), meta_bytes=p["meta_bytes"],
                        tag_keys=",".join(keys) if keys else None,
                        artifacts=p["tags"].get("artist") or p["tags"].get("TPE1"),
                    )
                except (ValueError, struct.error):
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "bytes":
                out[keep] = pdf[keep].to_numpy()
        yield out


def profile_audio_metadata(clips: DataFrame) -> DataFrame:
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in clips.schema.fields
        if f.name != "bytes"
    )
    return clips.mapInPandas(_profile_batches, f"{passthrough}, {AUDIO_META_SCHEMA}")


def _scrub_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs, removed = [], []
        for raw in pdf["bytes"]:
            if raw is None:
                outs.append(None)
                removed.append(None)
                continue
            try:
                b, r = strip_audio_metadata(bytes(raw))
            except (ValueError, struct.error, KeyError):
                b, r = bytes(raw), 0  # unknown container: passthrough
            outs.append(b)
            removed.append(r)
        out = pdf.copy()
        out["bytes"] = outs
        out["meta_removed_bytes"] = pd.array(removed, dtype="Int32")
        yield out


def scrub_audio_metadata(clips: DataFrame) -> DataFrame:
    """Rewrite pass: container metadata dropped, audio bit-identical;
    adds ``meta_removed_bytes``."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in clips.schema.fields
    )
    return clips.mapInPandas(_scrub_batches, f"{passthrough}, meta_removed_bytes int")


# --------------------------------------------------------------------------
# table-level strip (copy-on-write UPDATE)
# --------------------------------------------------------------------------
def strip_table_metadata(spark, table) -> str | None:
    """Rewrite the clips whose container carries metadata — bytes
    column replaced with the stripped form via the table's
    copy-on-write ``update`` (only affected files rewritten, row
    count asserted, time travel preserved). Container-less codecs
    (raw pcm/ulaw/alaw payloads) cannot carry tags and are excluded
    by the pushdown-friendly codec predicate before any Python runs.
    Returns the update snapshot id, or None when the table is clean."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _has_meta(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            if b is None:
                out.append(False)
                continue
            try:
                p = parse_audio_metadata(bytes(b))
                out.append(bool(p["tags"]) or p["meta_bytes"] > 0)
            except (ValueError, struct.error):
                out.append(False)
        return pd.Series(out)

    @pandas_udf("binary")
    def _strip(raw: pd.Series) -> pd.Series:
        out = []
        for b in raw:
            if b is None:
                out.append(None)
                continue
            try:
                out.append(strip_audio_metadata(bytes(b))[0])
            except (ValueError, struct.error, KeyError):
                out.append(bytes(b))
        return pd.Series(out)

    predicate = F.col("codec").isin("wav", "flac") & _has_meta(F.col("bytes"))
    return table.update(spark, predicate, {"bytes": _strip(F.col("bytes"))})


# --------------------------------------------------------------------------
# Ogg (OpusTags / Vorbis comment packet)
# --------------------------------------------------------------------------
def _ogg_pages(raw: bytes):
    """Yield (serial, seq, granule, header_type, seg_tbl, body) per
    page; ValueError on truncation (CRC is checked by parse_ogg)."""
    pos, n = 0, len(raw)
    while pos < n:
        if n - pos < 27 or raw[pos : pos + 4] != b"OggS":
            raise ValueError("truncated/corrupt Ogg page header")
        header_type = raw[pos + 5]
        granule = struct.unpack_from("<q", raw, pos + 6)[0]
        serial, seq = struct.unpack_from("<II", raw, pos + 14)
        n_segs = raw[pos + 26]
        seg_tbl = raw[pos + 27 : pos + 27 + n_segs]
        if len(seg_tbl) != n_segs:
            raise ValueError("truncated Ogg segment table")
        body_len = sum(seg_tbl)
        end = pos + 27 + n_segs + body_len
        if end > n:
            raise ValueError("truncated Ogg page body")
        yield serial, seq, granule, header_type, seg_tbl, raw[pos + 27 + n_segs : end]
        pos = end


def _vorbis_comments(b: bytes) -> tuple[str, dict[str, str]]:
    (vlen,) = struct.unpack_from("<I", b, 0)
    vendor = b[4 : 4 + vlen].decode("utf-8", errors="replace")
    p = 4 + vlen
    (n_c,) = struct.unpack_from("<I", b, p)
    p += 4
    tags: dict[str, str] = {}
    for _ in range(n_c):
        (clen,) = struct.unpack_from("<I", b, p)
        item = b[p + 4 : p + 4 + clen].decode("utf-8", errors="replace")
        p += 4 + clen
        if "=" in item:
            k, v = item.split("=", 1)
            tags[k.upper()] = v
    return vendor, tags


def _ogg_comment_pages(raw: bytes) -> tuple[list[int], bytes]:
    """Indexes of the pages carrying the comment packet (page seq 1
    plus continuations) and the reassembled packet bytes."""
    pages = list(_ogg_pages(raw))
    if len(pages) < 2:
        raise ValueError("ogg: no comment page")
    idxs, packet = [], b""
    for i, (_, _, _, htype, seg_tbl, body) in enumerate(pages):
        if i == 0:
            continue  # BOS / id header page
        if i > 1 and not (htype & 0x01):
            break  # continuation flag absent: packet ended
        idxs.append(i)
        packet += body
        if len(seg_tbl) == 0 or seg_tbl[-1] != 255:
            break  # packet complete on this page
    return idxs, packet


def _parse_ogg_meta(raw: bytes) -> tuple[dict, int]:
    idxs, packet = _ogg_comment_pages(raw)
    if packet.startswith(b"OpusTags"):
        vendor, tags = _vorbis_comments(packet[8:])
    elif packet.startswith(b"\x03vorbis"):
        vendor, tags = _vorbis_comments(packet[7:])
    else:
        return {}, 0
    # the minimal legal comment packet (vendor, zero comments) is
    # structural, not metadata — only user comments count
    return tags, (len(packet) if tags else 0)


def _replace_ogg_comment_packet(raw: bytes, new_packet: bytes, idxs: list[int]) -> bytes:
    """Page surgery: the comment packet's pages are replaced by ONE
    page carrying ``new_packet``; trailing pages are renumbered and
    their CRCs recomputed (bodies untouched)."""
    from bdqc_spark.functions.containers import _ogg_page, ogg_crc

    out = []
    new_seq = None
    offset = 0
    for i, (serial, seq, granule, htype, seg_tbl, body) in enumerate(_ogg_pages(raw)):
        span = 27 + len(seg_tbl) + sum(seg_tbl)
        start, offset = offset, offset + span
        if i in idxs:
            if i == idxs[0]:
                out.append(_ogg_page(serial, seq, granule, [new_packet]))
                new_seq = seq + 1
            continue  # continuation pages dropped
        if new_seq is None:
            out.append(raw[start : start + span])  # pages before: verbatim
        else:
            lacing = bytes(seg_tbl)
            hdr = (
                b"OggS" + b"\x00" + bytes([htype])
                + struct.pack("<q", granule)
                + struct.pack("<II", serial, new_seq)
                + b"\x00\x00\x00\x00"
                + bytes([len(lacing)]) + lacing
            )
            page = bytearray(hdr + body)
            page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
            out.append(bytes(page))
            new_seq += 1
    return b"".join(out)


def _comment_block(vendor: str, tags: dict[str, str]) -> bytes:
    body = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    body += struct.pack("<I", len(tags))
    for k, v in tags.items():
        item = f"{k}={v}".encode()
        body += struct.pack("<I", len(item)) + item
    return body


def _strip_ogg(raw: bytes) -> bytes:
    idxs, packet = _ogg_comment_pages(raw)
    if packet.startswith(b"OpusTags"):
        vendor, tags = _vorbis_comments(packet[8:])
        minimal = b"OpusTags" + _comment_block(vendor, {})
    elif packet.startswith(b"\x03vorbis"):
        vendor, tags = _vorbis_comments(packet[7:])
        minimal = b"\x03vorbis" + _comment_block(vendor, {}) + b"\x01"
    else:
        return raw
    if not tags:
        return raw
    return _replace_ogg_comment_packet(raw, minimal, idxs)


def add_ogg_comments(raw: bytes, tags: dict[str, str]) -> bytes:
    """Fixture helper: rewrite the comment packet WITH user comments
    (vendor preserved); the inverse surgery of _strip_ogg."""
    idxs, packet = _ogg_comment_pages(raw)
    if packet.startswith(b"OpusTags"):
        vendor, _ = _vorbis_comments(packet[8:])
        new = b"OpusTags" + _comment_block(vendor, tags)
    elif packet.startswith(b"\x03vorbis"):
        vendor, _ = _vorbis_comments(packet[7:])
        new = b"\x03vorbis" + _comment_block(vendor, tags) + b"\x01"
    else:
        raise ValueError("ogg: no comment packet to rewrite")
    return _replace_ogg_comment_packet(raw, new, idxs)
