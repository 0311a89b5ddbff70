"""Audio container profilers: Ogg/Opus (RFC 3533 + RFC 7845) and
MP3 (MPEG-1/2/2.5 Layer III frame headers), plus a unified media
sniffer over every format this engine understands.

Like functions/mp4.py, these read CONTAINER structure only — the
ingest-time QC pass a 100-TB audio corpus runs per file without
decoding a single sample: codec identity, channel count, sample
rate, page/frame counts, duration, CBR/VBR, integrity. Everything
from the public specs:

- Ogg: page grammar ("OggS", header-type flags, 64-bit granule,
  lacing-value segment table) with the REAL Ogg page CRC (CRC-32,
  poly 0x04C11DB7, MSB-first, init 0, no reflection, crc field
  zeroed during the sum — deliberately not zlib's reflected CRC);
  codec id from the first (BOS) packet: OpusHead (channel count,
  pre-skip, input rate; duration from the last granule at the fixed
  48 kHz granule rate minus pre-skip) or Vorbis id header.
- MP3: 4-byte frame header fields (version/layer/bitrate index/
  sample-rate index/padding/channel mode), the Layer III bitrate and
  sample-rate tables, frame-length arithmetic (1152- vs 576-sample
  frames), ID3v2 skip (syncsafe size), and the Xing/Info VBR header
  at its version/mode-dependent offset.

Deterministic from-scratch writers build spec-shaped fixtures so
tests and the registry need no external media. Spark contract: one
mapInPandas pass (profile_media), bytes consumed inside the stage,
corrupt rows degrade to parse_ok=false. Reference parity: the
reference's fileType dispatch (SURVEY.md §2 A2) — this module is
that dispatch for the compressed-audio family.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# Ogg page CRC (RFC 3533 appendix): poly 0x04C11DB7, MSB-first,
# init 0, no final xor, NOT reflected (≠ zlib.crc32).
# --------------------------------------------------------------------------
def _ogg_crc_table() -> np.ndarray:
    tbl = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = np.uint32(i << 24)
        for _ in range(8):
            r = np.uint32((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else np.uint32(r << 1)
        tbl[i] = r
    return tbl


_OGG_CRC_TBL = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    crc = np.uint32(0)
    tbl = _OGG_CRC_TBL
    for b in data:
        crc = np.uint32((crc << 8) ^ tbl[((crc >> 24) ^ b) & 0xFF])
    return int(crc)


def _ogg_page(
    serial: int, seq: int, granule: int, packets: list[bytes], header_type: int = 0
) -> bytes:
    body = b"".join(packets)
    lacing = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
    hdr = (
        b"OggS" + b"\x00" + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)]) + bytes(lacing)
    )
    page = bytearray(hdr + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def build_test_ogg_opus(
    channels: int = 1,
    input_rate: int = 16000,
    pre_skip: int = 312,
    n_audio_pages: int = 4,
    packets_per_page: int = 3,
    samples_per_packet: int = 960,  # 20 ms at the fixed 48 kHz granule rate
) -> bytes:
    """Spec-shaped Ogg/Opus stream: BOS page with OpusHead, a comment
    page with OpusTags, then data pages with fake packet payloads and
    correctly accumulating granule positions."""
    serial = 0x42D0
    opus_head = (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", input_rate)
        + struct.pack("<h", 0) + bytes([0])
    )
    opus_tags = b"OpusTags" + struct.pack("<I", 4) + b"bdqc" + struct.pack("<I", 0)
    pages = [
        _ogg_page(serial, 0, 0, [opus_head], header_type=0x02),  # BOS
        _ogg_page(serial, 1, 0, [opus_tags]),
    ]
    granule = pre_skip
    rng = np.random.default_rng(7)
    for i in range(n_audio_pages):
        pkts = [
            bytes([0x78]) + bytes(rng.integers(0, 256, 40).astype(np.uint8))
            for _ in range(packets_per_page)
        ]
        granule += samples_per_packet * packets_per_page
        last = i == n_audio_pages - 1
        pages.append(
            _ogg_page(serial, 2 + i, granule, pkts, header_type=0x04 if last else 0)
        )
    return b"".join(pages)


def parse_ogg(raw: bytes) -> dict:
    """→ profile dict; ValueError on malformed pages / CRC mismatch."""
    if not raw.startswith(b"OggS"):
        raise ValueError("not an Ogg stream")
    pos, n_pages, last_granule = 0, 0, 0
    first_packet = None
    n = len(raw)
    while pos < n:
        if n - pos < 27 or raw[pos : pos + 4] != b"OggS":
            raise ValueError("truncated/corrupt Ogg page header")
        if raw[pos + 4] != 0:
            raise ValueError(f"unknown Ogg version {raw[pos + 4]}")
        granule = struct.unpack_from("<q", raw, pos + 6)[0]
        (crc_stored,) = struct.unpack_from("<I", raw, pos + 22)
        n_segs = raw[pos + 26]
        seg_tbl = raw[pos + 27 : pos + 27 + n_segs]
        if len(seg_tbl) != n_segs:
            raise ValueError("truncated Ogg segment table")
        body_len = sum(seg_tbl)
        end = pos + 27 + n_segs + body_len
        if end > n:
            raise ValueError("truncated Ogg page body")
        page = bytearray(raw[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("Ogg page CRC mismatch")
        if first_packet is None:
            first_packet = raw[pos + 27 + n_segs : end]
        if granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = end
    prof: dict = {"container": "ogg", "n_pages": n_pages, "codec": None,
                  "channels": None, "sample_rate": None, "duration_ms": None}
    fp = first_packet or b""
    if fp.startswith(b"OpusHead") and len(fp) >= 19:
        pre_skip = struct.unpack_from("<H", fp, 10)[0]
        prof.update(
            codec="opus",
            channels=fp[9],
            sample_rate=struct.unpack_from("<I", fp, 12)[0],
            # Opus granules run at the fixed 48 kHz decode rate
            duration_ms=max(last_granule - pre_skip, 0) / 48000.0 * 1000.0,
        )
    elif fp.startswith(b"\x01vorbis") and len(fp) >= 16:
        sr = struct.unpack_from("<I", fp, 12)[0]
        prof.update(codec="vorbis", channels=fp[11], sample_rate=sr)
        if sr > 0:
            prof["duration_ms"] = last_granule / sr * 1000.0
    return prof


# --------------------------------------------------------------------------
# MP3 frame-header walk (MPEG-1/2/2.5 Layer III)
# --------------------------------------------------------------------------
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_BR_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_SR_V1 = [44100, 48000, 32000, 0]


def _mp3_frame(version_bits: int, br_idx: int, sr_idx: int, padding: int, mode: int):
    """→ (frame_len_bytes, bitrate_kbps, sample_rate, samples_per_frame)
    or None for an invalid header combination."""
    if version_bits == 1:  # reserved
        return None
    v1 = version_bits == 3
    br = (_BR_V1_L3 if v1 else _BR_V2_L3)[br_idx]
    sr = _SR_V1[sr_idx]
    if br == 0 or sr == 0:
        return None
    if version_bits == 2:
        sr //= 2  # MPEG-2
    elif version_bits == 0:
        sr //= 4  # MPEG-2.5
    spf = 1152 if v1 else 576
    flen = spf // 8 * br * 1000 // sr + padding
    return flen, br, sr, spf


def build_test_mp3(
    n_frames: int = 30,
    bitrate_idx: int = 9,
    sr_idx: int = 0,
    mpeg1: bool = True,
    mono: bool = False,
    id3_size: int = 0,
    xing: bool = False,
    vbr_pattern: tuple[int, ...] = (),
) -> bytes:
    """Deterministic MP3: optional ID3v2 tag, then n_frames valid
    Layer III frames (payload zeros). vbr_pattern cycles bitrate
    indices to synthesize a VBR file; xing plants a Xing header in
    the first frame at its version/mode-dependent offset."""
    out = bytearray()
    if id3_size:
        ss = [(id3_size >> s) & 0x7F for s in (21, 14, 7, 0)]
        out += b"ID3" + bytes([4, 0, 0] + ss) + b"\x00" * id3_size
    vbits = 3 if mpeg1 else 2
    mode = 3 if mono else 1
    for i in range(n_frames):
        bi = vbr_pattern[i % len(vbr_pattern)] if vbr_pattern else bitrate_idx
        flen, br, sr, spf = _mp3_frame(vbits, bi, sr_idx, 0, mode)
        b1 = 0xFF
        b2 = 0xE0 | (vbits << 3) | (1 << 1)  # layer III = 0b01
        b3 = (bi << 4) | (sr_idx << 2)
        b4 = mode << 6
        frame = bytearray([b1, b2, b3, b4]) + b"\x00" * (flen - 4)
        if xing and i == 0:
            side = (17 if mono else 32) if mpeg1 else (9 if mono else 17)
            off = 4 + side
            frame[off : off + 4] = b"Xing"
            frame[off + 4 : off + 8] = struct.pack(">I", 0x1)  # frames flag
            frame[off + 8 : off + 12] = struct.pack(">I", n_frames)
        out += frame
    return bytes(out)


def parse_mp3(raw: bytes) -> dict:
    """→ profile dict; ValueError if no valid frame chain exists."""
    pos = 0
    n = len(raw)
    if raw.startswith(b"ID3") and n >= 10:
        size = 0
        for b in raw[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    frames = 0
    bitrates: set[int] = set()
    sr_out = spf_out = 0
    mode_out = None
    xing_frames = None
    while pos + 4 <= n:
        b1, b2, b3, b4 = raw[pos : pos + 4]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            break
        vbits = (b2 >> 3) & 0x3
        layer = (b2 >> 1) & 0x3
        if layer != 1:  # only Layer III here
            break
        info = _mp3_frame(vbits, b3 >> 4, (b3 >> 2) & 0x3, (b3 >> 1) & 0x1, b4 >> 6)
        if info is None:
            break
        flen, br, sr, spf = info
        if pos + flen > n:
            break  # trailing truncated frame: stop, keep the chain so far
        if frames == 0:
            mono = (b4 >> 6) == 3
            side = (17 if mono else 32) if vbits == 3 else (9 if mono else 17)
            off = pos + 4 + side
            if raw[off : off + 4] in (b"Xing", b"Info"):
                flags = struct.unpack_from(">I", raw, off + 4)[0]
                if flags & 0x1:
                    xing_frames = struct.unpack_from(">I", raw, off + 8)[0]
        frames += 1
        bitrates.add(br)
        sr_out, spf_out = sr, spf
        mode_out = "mono" if (b4 >> 6) == 3 else "stereo"
        pos += flen
    if frames == 0:
        raise ValueError("no valid MP3 frame chain")
    return {
        "container": "mp3",
        "codec": "mp3",
        "n_frames": frames,
        "sample_rate": sr_out,
        "channels": 1 if mode_out == "mono" else 2,
        "vbr": len(bitrates) > 1,
        "bitrate_kbps": (max(bitrates) if len(bitrates) > 1 else next(iter(bitrates))),
        "duration_ms": frames * spf_out / sr_out * 1000.0,
        "xing_frames": xing_frames,
    }


# --------------------------------------------------------------------------
# Unified sniffer — fileType dispatch over every format the engine knows
# --------------------------------------------------------------------------
SNIFF_SCHEMA = (
    "parse_ok boolean, format string, codec string, channels int, "
    "sample_rate int, width int, height int, duration_ms double, detail string"
)


def sniff_media(raw: bytes) -> dict:
    """Magic-number dispatch → per-format profile. Raises ValueError
    for unknown or malformed payloads."""
    if len(raw) < 4:
        raise ValueError("too short to sniff")
    out: dict = {"format": None, "codec": None, "channels": None,
                 "sample_rate": None, "width": None, "height": None,
                 "duration_ms": None, "detail": None}
    if raw.startswith(b"RIFF") and raw[8:12] == b"WAVE":
        from bdqc_spark.functions.audio import wav_info

        fmt = wav_info(raw)
        codec = {1: "pcm", 3: "pcm_float", 6: "alaw", 7: "ulaw", 17: "adpcm"}.get(
            fmt["fmt_tag"], f"fmt_{fmt['fmt_tag']}"
        )
        sr, ch = fmt["hdr_sr"], fmt["channels"]
        n_frames = fmt["fact_samples"]
        if n_frames is None and fmt["block_align"]:
            n_frames = (fmt["data_end"] - fmt["data_start"]) // fmt["block_align"]
        out.update(format="wav", codec=codec, channels=ch, sample_rate=sr,
                   duration_ms=(n_frames / sr * 1000.0) if (sr and n_frames) else None)
    elif raw.startswith(b"fLaC"):
        from bdqc_spark.functions.flac import flac_info

        si = flac_info(raw)
        out.update(format="flac", codec="flac", channels=si["channels"],
                   sample_rate=si["sr"],
                   duration_ms=si["total_samples"] / si["sr"] * 1000.0
                   if si["sr"] else None)
    elif raw.startswith(b"OggS"):
        p = parse_ogg(raw)
        out.update(format="ogg", codec=p["codec"], channels=p["channels"],
                   sample_rate=p["sample_rate"], duration_ms=p["duration_ms"],
                   detail=f"pages={p['n_pages']}")
    elif raw.startswith(b"ID3") or (
        raw[0] == 0xFF and (raw[1] & 0xE0) == 0xE0 and ((raw[1] >> 1) & 0x3) == 1
    ):
        p = parse_mp3(raw)
        out.update(format="mp3", codec="mp3", channels=p["channels"],
                   sample_rate=p["sample_rate"], duration_ms=p["duration_ms"],
                   detail=f"frames={p['n_frames']} vbr={p['vbr']}")
    elif raw.startswith(b"\x89PNG\r\n\x1a\n"):
        from bdqc_spark.functions.multimodal import decode_image

        img = decode_image(raw)
        out.update(format="png", codec="png",
                   height=img.shape[0], width=img.shape[1])
    elif raw.startswith(b"\xff\xd8"):
        from bdqc_spark.functions.jpeg import decode_jpeg

        img = decode_jpeg(raw)
        out.update(format="jpeg", codec="jpeg",
                   height=img.shape[0], width=img.shape[1])
    elif len(raw) >= 12 and raw[4:8] == b"ftyp":
        from bdqc_spark.functions.mp4 import parse_mp4

        p = parse_mp4(raw)
        vid = next((t for t in p["tracks"] if t.get("handler") == "vide"), {})
        aud = next((t for t in p["tracks"] if t.get("handler") == "soun"), {})
        out.update(format="mp4", codec=vid.get("codec") or aud.get("codec"),
                   channels=aud.get("channels"), sample_rate=aud.get("sample_rate"),
                   width=vid.get("width"), height=vid.get("height"),
                   duration_ms=p["duration_ms"], detail=f"tracks={p['n_tracks']}")
    elif raw.startswith(b"\x1aE\xdf\xa3"):
        from bdqc_spark.functions.webm import parse_webm

        p = parse_webm(raw)
        vid = next((t for t in p["tracks"] if t.get("type") == 1), {})
        aud = next((t for t in p["tracks"] if t.get("type") == 2), {})
        sr = aud.get("sample_rate")
        out.update(format=p["doc_type"], codec=vid.get("codec") or aud.get("codec"),
                   channels=aud.get("channels"),
                   sample_rate=int(round(sr)) if sr else None,
                   width=vid.get("width"), height=vid.get("height"),
                   duration_ms=p["duration_ms"],
                   detail=f"tracks={p['n_tracks']} clusters={p['n_clusters']}")
    elif raw.startswith(b"YUV4MPEG2"):
        from bdqc_spark.functions.multimodal import parse_y4m_header

        y = parse_y4m_header(raw)
        out.update(format="y4m", codec="rawvideo", width=y["width"],
                   height=y["height"], detail=f"fps={y['fps']:g} {y['chroma']}")
    else:
        raise ValueError("unknown media format")
    return out


def _sniff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for raw in pdf["bytes"]:
            row = {"parse_ok": False, "format": None, "codec": None,
                   "channels": None, "sample_rate": None, "width": None,
                   "height": None, "duration_ms": None, "detail": None}
            if raw is not None:
                try:
                    row.update(sniff_media(bytes(raw)), parse_ok=True)
                except (ValueError, NotImplementedError, KeyError, struct.error):
                    pass
            rows.append(row)
        out = pd.DataFrame(rows)
        for keep in pdf.columns:
            if keep != "bytes":
                out[keep] = pdf[keep].to_numpy()
        yield out


def profile_media(files: DataFrame) -> DataFrame:
    """files(id, bytes [, meta...]) → sniffed per-file profile; the
    engine's fileType dispatch as one mapInPandas pass."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in files.schema.fields
        if f.name != "bytes"
    )
    return files.mapInPandas(_sniff_batches, f"{passthrough}, {SNIFF_SCHEMA}")
