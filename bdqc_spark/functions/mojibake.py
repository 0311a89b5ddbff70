"""Encoding-damage detection and repair (mojibake), ftfy-style.

Web-scraped corpora are full of text that was UTF-8 on the wire but
got decoded as cp1252/latin-1 somewhere in the pipeline ("Ã©tÃ©" for
"été", "â€™" for "'"), sometimes twice. The public fix (the approach
of the widely-used ftfy tool, reimplemented from scratch here) is:
re-encode the damaged text through the "sloppy" cp1252 table (cp1252
plus the five latin-1 C1 bytes cp1252 leaves undefined, so BOTH
mis-decodes round-trip) and strictly decode the bytes as UTF-8 —
applied only while it strictly reduces a mojibake badness score, so
clean text (including legitimate accented text) is never touched and
a failed strict decode can never replace the original.

Badness score: count of two-char sequences where a UTF-8 LEAD-byte
character (U+00C2–U+00F4) is followed by a continuation-looking
character (U+0080–U+00BF, or a cp1252 mapping of bytes 0x80–0x9F such
as € ™ " "). Single accented letters followed by ordinary letters
score zero — "déjà vu" is untouchable by construction.

Spark contract: one mapInPandas pass (string re-decoding is
inherently per-string; batches are Arrow-sized); emits the repaired
text plus an audit (score before, passes applied) so a QC report can
quantify encoding damage per source.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# --- sloppy cp1252: every byte decodes, every decoded char re-encodes ---
_BYTE_TO_CHAR: dict[int, str] = {}
for _b in range(256):
    try:
        _BYTE_TO_CHAR[_b] = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:  # the five cp1252 holes: 81 8D 8F 90 9D
        _BYTE_TO_CHAR[_b] = chr(_b)
_CHAR_TO_BYTE: dict[str, int] = {c: b for b, c in _BYTE_TO_CHAR.items()}
# latin-1 C1 controls that cp1252 maps elsewhere must also re-encode
for _b in range(0x80, 0xA0):
    _CHAR_TO_BYTE.setdefault(chr(_b), _b)

_CONTINUATION_CHARS = frozenset(
    {chr(c) for c in range(0x80, 0xC0)} | {_BYTE_TO_CHAR[b] for b in range(0x80, 0xC0)}
)
_LEAD_CHARS = frozenset(chr(c) for c in range(0xC2, 0xF5))

MAX_PASSES = 3  # single, double, triple mis-decode


def mojibake_score(text: str) -> int:
    """Number of lead+continuation character pairs — 0 for clean text."""
    return sum(
        1
        for a, b in zip(text, text[1:])
        if a in _LEAD_CHARS and b in _CONTINUATION_CHARS
    )


def _sloppy_encode(text: str) -> bytes | None:
    out = bytearray()
    for ch in text:
        b = _CHAR_TO_BYTE.get(ch)
        if b is None:
            return None  # genuine non-latin char: was never a mis-decode
        out.append(b)
    return bytes(out)


def fix_mojibake(text: str) -> tuple[str, int]:
    """Repair up to MAX_PASSES layers of UTF-8-as-cp1252/latin-1
    damage. Returns (repaired, n_passes). Only rewrites while the
    badness score strictly drops AND the bytes strictly decode as
    UTF-8 — clean or ambiguous text comes back unchanged."""
    passes = 0
    score = mojibake_score(text)
    while score > 0 and passes < MAX_PASSES:
        raw = _sloppy_encode(text)
        if raw is None:
            break
        try:
            candidate = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        cand_score = mojibake_score(candidate)
        if cand_score >= score:
            break
        text, score, passes = candidate, cand_score, passes + 1
    return text, passes


def _moji_batches(text_col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed, before, n_passes = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    fixed.append(None)
                    before.append(None)
                    n_passes.append(None)
                    continue
                s = mojibake_score(t)
                f, p = fix_mojibake(t) if s else (t, 0)
                fixed.append(f)
                before.append(s)
                n_passes.append(p)
            out = pdf.copy()
            out[text_col] = fixed
            out["moji_score"] = pd.array(before, dtype="Int32")
            out["moji_passes"] = pd.array(n_passes, dtype="Int32")
            yield out

    return gen


def repair_encoding(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(…, text) → same rows with ``text`` repaired plus
    ``moji_score`` (badness before repair) and ``moji_passes``
    (mis-decode layers undone; 0 = untouched)."""
    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return docs.mapInPandas(
        _moji_batches(text_col), f"{passthrough}, moji_score int, moji_passes int"
    )
