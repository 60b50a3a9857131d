"""Multimodal plumbing: binary media columns -> metadata / features /
frame sampling via mapInPandas (decode stubbed deterministically —
no codec libs in this container; the Spark plan is the deliverable)."""

from __future__ import annotations

import struct

import pytest

from dqmtools_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media_meta,
    extract_features,
    frame_sample_plan,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h)
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _jpeg(w: int, h: int) -> bytes:
    # SOI + SOF0 segment with dims
    return (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 8 + 9) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 20
    )


def _media_df(spark):
    rows = [
        (1, "image", _png(640, 480), "image/png"),
        (2, "image", _gif(32, 16), "image/gif"),
        (3, "image", _jpeg(1920, 1080), "image/jpeg"),
        (4, "image", b"not an image at all", "application/octet-stream"),
        (5, "image", None, None),
        (6, "video", b"\x00" * 90_000, "video/mp4"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_meta_parses_real_headers(spark):
    meta = {r["media_id"]: r for r in decode_media_meta(_media_df(spark)).collect()}
    assert (meta[1]["format"], meta[1]["width"], meta[1]["height"]) == ("png", 640, 480)
    assert (meta[2]["format"], meta[2]["width"], meta[2]["height"]) == ("gif", 32, 16)
    assert (meta[3]["format"], meta[3]["width"], meta[3]["height"]) == ("jpeg", 1920, 1080)
    assert meta[4]["format"] is None
    assert meta[5]["n_bytes"] is None
    assert meta[6]["n_bytes"] == 90_000


def test_extract_features_deterministic(spark):
    df = _media_df(spark)
    a = {r["media_id"]: r["feature"] for r in extract_features(df).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(df).collect()}
    assert a == b                      # deterministic across runs
    assert len(a[1]) == FEATURE_DIM
    assert a[5] is None                # null payload -> null feature
    assert a[1] != a[2]


def test_extract_features_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError, match="image/audio library"):
        extract_features(_media_df(spark), stub=False)


def test_frame_sample_plan_explodes_every_n(spark):
    frames = frame_sample_plan(_media_df(spark), every_n=30).collect()
    by_id: dict[int, list[int]] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # 90_000 bytes -> 90 "frames" -> sampled at 0, 30, 60
    assert sorted(by_id[6]) == [0, 30, 60]
    # small/None payloads still emit frame 0 (greatest(...) guard)
    assert by_id[1] == [0]
