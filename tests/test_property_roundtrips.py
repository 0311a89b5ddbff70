"""Property-based round-trips for the byte-grammar operators added in
the round-5 final session (mojibake repair, EBML VINTs, audio
metadata, interval join, as-of join) — hypothesis drives arbitrary
inputs through the encode→decode / plant→recover cycles the unit
tests only spot-check."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------------------------ mojibake
# printable unicode that cp1252 CAN carry after a utf-8 mis-decode:
# anything encodable to utf-8 (all of unicode) works as the ORIGINAL
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    min_size=1,
    max_size=80,
)


@settings(max_examples=60, deadline=None)
@given(_text, st.integers(min_value=1, max_value=3))
def test_mojibake_round_trip_property(orig, layers):
    from bdqc_spark.functions.mojibake import _BYTE_TO_CHAR, fix_mojibake, mojibake_score

    broken = orig
    for _ in range(layers):
        broken = "".join(_BYTE_TO_CHAR[b] for b in broken.encode("utf-8"))
    fixed, passes = fix_mojibake(broken)
    if mojibake_score(orig) == 0:
        # a CLEAN original is never touched, and when damage was
        # detectable the repair lands exactly back on it (an original
        # that itself scores as mojibake is legitimately over-repaired
        # — undecidable by construction, so excluded here)
        assert fix_mojibake(orig) == (orig, 0)
        if mojibake_score(broken) > 0:
            assert fixed == orig or passes == 0


# ------------------------------------------------------------------ EBML VINT
@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**35 - 2))
def test_ebml_size_vint_round_trip(n):
    from bdqc_spark.functions.webm import _enc_size, _vint

    enc = _enc_size(n)
    val, pos, all_ones = _vint(enc, 0, len(enc), keep_marker=False)
    assert val == n and pos == len(enc) and not all_ones


# ------------------------------------------------------------------ WAV INFO
_tag_val = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x10FFFF,
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=40,
).filter(lambda s: "\x00" not in s)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.sampled_from(["artist", "title", "comment", "date", "software"]),
    _tag_val, min_size=1, max_size=5,
))
def test_wav_info_round_trip_property(tags):
    from bdqc_spark.functions.audio import decode, encode
    from bdqc_spark.functions.audio_metadata import (
        add_wav_info,
        parse_audio_metadata,
        strip_audio_metadata,
    )

    pcm = (0.1 * np.sin(np.arange(800) / 20.0)).astype(np.float32)
    plain = encode(pcm, "wav", 16000)
    tagged = add_wav_info(plain, tags)
    parsed = parse_audio_metadata(tagged)["tags"]
    assert parsed == tags
    stripped, removed = strip_audio_metadata(tagged)
    assert removed > 0
    assert parse_audio_metadata(stripped)["tags"] == {}
    np.testing.assert_array_equal(decode(stripped, "wav"), decode(plain, "wav"))


# ------------------------------------------------------------------ ID3v2
@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.sampled_from(["TPE1", "TIT2", "TALB", "TYER"]),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=255),
            min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
    min_size=1, max_size=4,
))
def test_id3v2_round_trip_property(tags):
    from bdqc_spark.functions.audio_metadata import (
        _parse_id3v2,
        build_id3v2,
        strip_audio_metadata,
    )
    from bdqc_spark.functions.containers import build_test_mp3

    blob = build_id3v2(tags)
    parsed, size = _parse_id3v2(blob)
    assert parsed == tags and size == len(blob)
    mp3 = blob + build_test_mp3(n_frames=4, id3_size=0)
    stripped, removed = strip_audio_metadata(mp3)
    assert removed == len(blob)
    assert not stripped.startswith(b"ID3")


# ------------------------------------------------------------------ intervals
@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(st.floats(0, 100, allow_nan=False),
                       st.floats(0, 30, allow_nan=False)),
             min_size=1, max_size=8),
    st.lists(st.tuples(st.floats(0, 100, allow_nan=False),
                       st.floats(0, 30, allow_nan=False)),
             min_size=1, max_size=8),
    st.floats(min_value=0.5, max_value=60),
)
def test_interval_join_matches_brute_force(spark, lspec, rspec, width):
    import pandas as pd

    from bdqc_spark.operators.asof import interval_join

    lp = pd.DataFrame(
        [("k", i, s, s + d) for i, (s, d) in enumerate(lspec)],
        columns=["k", "lid", "s", "e"],
    )
    rp = pd.DataFrame(
        [("k", i, s, s + d) for i, (s, d) in enumerate(rspec)],
        columns=["k", "rid", "s", "e"],
    )
    out = interval_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp),
        by=["k"], l_id="lid", r_id="rid",
        l_start="s", l_end="e", r_start="s", r_end="e", bin_width=float(width),
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    want = sorted(
        (int(l.lid), int(r.rid))
        for _, l in lp.iterrows()
        for _, r in rp.iterrows()
        if l.s <= r.e and r.s <= l.e
    )
    assert got == want
