"""Encoding repair (functions/mojibake.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from bdqc_spark.functions.mojibake import (
    fix_mojibake,
    mojibake_score,
    repair_encoding,
)

CLEAN = [
    "The quick brown fox jumps over the lazy dog.",
    "déjà vu — l'été à Orléans, garçon naïf",
    "Übergröße, schön & grün",
    "日本語のテキスト and 中文文本",
    "emoji 😀 stays 🎉",
    "math: ∑ x² ≤ ∞",
]


def _break(text: str, codec: str, times: int = 1) -> str:
    for _ in range(times):
        text = text.encode("utf-8").decode(codec)
    return text


def _sloppy_break(text: str, times: int = 1) -> str:
    # cp1252 with the ftfy 'sloppy' hole filling (bytes 81/8D/8F/90/9D)
    from bdqc_spark.functions.mojibake import _BYTE_TO_CHAR

    for _ in range(times):
        text = "".join(_BYTE_TO_CHAR[b] for b in text.encode("utf-8"))
    return text


def test_clean_text_untouched():
    for t in CLEAN:
        assert mojibake_score(t) == 0
        assert fix_mojibake(t) == (t, 0)


@pytest.mark.parametrize("codec", ["latin-1", "cp1252"])
@pytest.mark.parametrize("times", [1, 2, 3])
def test_round_trip_accented(codec, times):
    orig = "l'été à Orléans — « déjà vu », naïveté"
    broken = (
        _break(orig, "latin-1", times) if codec == "latin-1" else _sloppy_break(orig, times)
    )
    assert mojibake_score(broken) > 0
    fixed, passes = fix_mojibake(broken)
    assert fixed == orig
    assert passes == times


def test_round_trip_cjk_and_emoji():
    for orig in ("東京 2020 🎌", "смысл текста", "ένα κείμενο", "😀😃"):
        broken = _sloppy_break(orig)
        fixed, passes = fix_mojibake(broken)
        assert fixed == orig, (orig, broken)
        assert passes == 1


def test_classic_punctuation_mojibake():
    # the single most common artifact on the web
    assert fix_mojibake("donâ€™t â€” â€œquotedâ€\x9d")[0] == "don’t — “quoted”"


def test_truncated_mojibake_left_alone():
    broken = _sloppy_break("l'été à Orléans")[:-1]  # cut mid-sequence
    # strict UTF-8 decode of the tail fails → must return input as-is
    fixed, passes = fix_mojibake(broken)
    if passes == 0:
        assert fixed == broken


def test_spark_pass_and_audit(spark):
    orig = ["plain ascii", "l'été à Orléans", "don’t — “quoted”", None]
    texts = [orig[0], _sloppy_break(orig[1]), _sloppy_break(orig[2], 2), None]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c", "d"], "text": texts})
    )
    out = repair_encoding(df, "text").toPandas().set_index("doc_id")
    assert out.loc["a", "text"] == orig[0] and out.loc["a", "moji_passes"] == 0
    assert out.loc["b", "text"] == orig[1] and out.loc["b", "moji_passes"] == 1
    assert out.loc["c", "text"] == orig[2] and out.loc["c", "moji_passes"] == 2
    assert pd.isna(out.loc["d", "text"])
    assert out.loc["b", "moji_score"] > 0
