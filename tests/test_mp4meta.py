"""MP4/ISO-BMFF metadata walker: real container parsing, stubbed
frames (H.264/AAC need external codecs — `extract_features` keeps
yielding null for MP4; `decode_media_meta` now reports genuine
dimensions from the tkhd box tree)."""

from __future__ import annotations

import pytest

from dqmtools_spark.functions.mp4meta import encode_mp4_meta, parse_mp4_meta


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("largesize", [False, True])
def test_dims_and_duration(version, largesize):
    b = encode_mp4_meta(
        1920, 1080, 12.5, version=version, largesize_moov=largesize
    )
    assert parse_mp4_meta(b) == (1920, 1080, 12.5)


def test_not_mp4_raises_and_box_overrun_raises():
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00" * 20)
    good = encode_mp4_meta(64, 48, 1.0)
    # cut INSIDE the moov box: its declared size now overruns the data
    with pytest.raises(ValueError):
        parse_mp4_meta(good[:40])
    # cut AT a box boundary: valid prefix, metadata simply absent
    assert parse_mp4_meta(good[:24]) == (None, None, None)


def test_meta_sniff_reports_mp4_dims(spark):
    from dqmtools_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_meta,
        extract_features,
    )

    mp4 = encode_mp4_meta(640, 360, 3.0)
    df = spark.createDataFrame(
        [(0, "video", bytearray(mp4), "video/mp4")], MEDIA_SCHEMA
    )
    r = decode_media_meta(df).collect()[0]
    assert (r["format"], r["width"], r["height"]) == ("mp4", 640, 360)
    # frames stay honestly stubbed: null feature, not a crash
    assert extract_features(df, stub=False).collect()[0]["feature"] is None
