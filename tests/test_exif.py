"""EXIF PII detection and stripping (functions/exif.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdqc_spark.functions.exif import (
    build_exif_segment,
    inject_exif,
    parse_exif,
    profile_exif,
    scrub_exif,
    strip_exif,
)
from bdqc_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def jpegs():
    plain = encode_jpeg(_img(), quality=85)
    with_gps = inject_exif(plain, build_exif_segment(gps=(48.85, 2.35)))
    no_gps = inject_exif(
        plain, build_exif_segment(make="acme", model="cam 2", gps=None)
    )
    return plain, with_gps, no_gps


def test_parse_round_trip(jpegs):
    plain, with_gps, no_gps = jpegs
    assert parse_exif(plain) is None
    p = parse_exif(with_gps)
    assert p == {
        "orientation": 6, "has_datetime": True, "has_gps": True,
        "make": "bdqc", "model": "synthcam 1",
    }
    q = parse_exif(no_gps)
    assert q["has_gps"] is False and q["make"] == "acme" and q["model"] == "cam 2"


def test_strip_removes_exif_and_preserves_pixels(jpegs):
    plain, with_gps, _ = jpegs
    stripped, had = strip_exif(with_gps)
    assert had and parse_exif(stripped) is None
    np.testing.assert_array_equal(decode_jpeg(stripped), decode_jpeg(with_gps))
    # no-exif input: passthrough reports had=False, still decodes
    same, had2 = strip_exif(plain)
    assert not had2
    np.testing.assert_array_equal(decode_jpeg(same), decode_jpeg(plain))


def test_malformed_inputs(jpegs):
    _, with_gps, _ = jpegs
    with pytest.raises(ValueError):
        parse_exif(b"not a jpeg at all")
    with pytest.raises(ValueError):
        parse_exif(with_gps[:40])  # truncated mid-segment


def test_spark_profile_and_scrub(spark, jpegs):
    plain, with_gps, no_gps = jpegs
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "img_id": ["plain", "gps", "nogps", "junk", "null"],
                "bytes": [plain, with_gps, no_gps, b"\x00\x01\x02", None],
            }
        )
    )
    prof = profile_exif(df).toPandas().set_index("img_id")
    assert not prof.loc["plain", "exif_present"]
    assert prof.loc["gps", "exif_present"] and prof.loc["gps", "has_gps"]
    assert prof.loc["nogps", "exif_present"] and not prof.loc["nogps", "has_gps"]
    assert not prof.loc["junk", "exif_present"]

    scr = scrub_exif(df).toPandas().set_index("img_id")
    assert scr.loc["gps", "exif_removed"]
    assert parse_exif(bytes(scr.loc["gps", "bytes"])) is None
    np.testing.assert_array_equal(
        decode_jpeg(bytes(scr.loc["gps", "bytes"])), decode_jpeg(with_gps)
    )
    assert not scr.loc["plain", "exif_removed"]
    assert bytes(scr.loc["junk", "bytes"]) == b"\x00\x01\x02"  # passthrough
