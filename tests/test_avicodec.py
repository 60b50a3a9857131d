"""MJPEG-AVI container parser + frame-sampling video features.

Ground truth: fixture AVIs embed JPEG frames whose pixels are known in
closed form (DC-only blocks: every pixel is clip(round(dc/8 + 128))),
so luma means, frame diffs and the sampling pattern are all checked
against paper arithmetic — the container walker and the JPEG decoder
are exercised together but the expectations come from neither.
"""

from __future__ import annotations

import numpy as np
import pytest

from dqmtools_spark.functions.avicodec import (
    avi_features,
    encode_avi,
    parse_avi,
    sample_frames,
)
from dqmtools_spark.functions.jpegcodec import encode_jpeg_from_coeffs


def _flat_jpeg(dc: int, nb: int = 2) -> bytes:
    """16x16 grayscale JPEG, every pixel exactly clip(round(dc/8+128))."""
    blocks = [[np.full((8, 8), 0, dtype=int) for _ in range(nb)] for _ in range(nb)]
    for row in blocks:
        for b in row:
            b[0, 0] = dc
    return encode_jpeg_from_coeffs(
        8 * nb, 8 * nb,
        [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}],
        {0: [1] * 64},
    )


def _luma(dc: int) -> float:
    return float(np.clip(round(dc / 8 + 128), 0, 255))


@pytest.mark.parametrize("extra_stream", [False, True])
def test_parse_and_sampling_pattern(extra_stream):
    """6 frames sampled at k=4 picks indices round(i*5/3) = {0, 2, 3,
    5}; with a leading audio stream the video chunks are '01dc' and
    must still be found."""
    dcs = [-400, -200, 0, 200, 400, 600]
    avi = encode_avi(
        16, 16, 25.0, [_flat_jpeg(d) for d in dcs], extra_stream=extra_stream
    )
    info = parse_avi(avi)
    assert (info["width"], info["height"], info["fps"]) == (16, 16, 25.0)
    assert info["n_frames"] == 6 and info["handler"] == "MJPG"
    frames = sample_frames(avi, k=4)
    assert [f[:3] for f in frames] == [(16, 16, 1)] * 4
    got = [float(np.frombuffer(p, np.uint8)[0]) for (_w, _h, _c, p) in frames]
    assert got == [_luma(dcs[i]) for i in (0, 2, 3, 5)]


def test_features_closed_form():
    dcs = [-400, 0, 400, 800]  # lumas 78, 128, 178, 228
    avi = encode_avi(16, 16, 10.0, [_flat_jpeg(d) for d in dcs])
    f = avi_features(avi, k=4)
    assert len(f) == 16
    lumas = [_luma(d) for d in dcs]
    assert f[0] == 16.0 and f[1] == 16.0
    assert f[2] == 4.0 and f[3] == 10.0
    assert abs(f[4] - 0.4) < 1e-6                       # duration
    assert f[5] == 4.0
    assert abs(f[6] - np.mean(lumas)) < 1e-4            # mean luma
    assert abs(f[8] - 50.0) < 1e-4 and abs(f[9] - 50.0) < 1e-4  # diffs
    # first frame luma 78 lands in bin floor(78/256*6)=1 of 6
    assert f[10] == 0.0 and f[11] == 1.0


def test_progressive_frames_inside_avi():
    """MJPEG frames are whole JPEGs — a progressive frame must decode
    through the same path."""
    from dqmtools_spark.functions.jpegcodec import (
        encode_progressive_jpeg_from_coeffs,
    )

    rng = np.random.default_rng(6)
    blocks = [[np.zeros((8, 8), dtype=int) for _ in range(2)] for _ in range(2)]
    for row in blocks:
        for b in row:
            b[0, 0] = int(rng.integers(-300, 300))
    comp = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    prog = encode_progressive_jpeg_from_coeffs(
        16, 16, comp, {0: [1] * 64},
        [
            {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 1},
            {"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0},
            {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 0},
        ],
    )
    base = encode_jpeg_from_coeffs(16, 16, comp, {0: [1] * 64})
    avi = encode_avi(16, 16, 5.0, [base, prog])
    a, b = sample_frames(avi, k=2)
    assert a == b  # same coefficients -> identical pixels either way


def test_malformed_and_unsupported_raise_cleanly():
    good = encode_avi(16, 16, 25.0, [_flat_jpeg(0)] * 2)
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(good[:60])                        # truncated hdrl
    with pytest.raises(NotImplementedError):
        sample_frames(
            encode_avi(16, 16, 25.0, [_flat_jpeg(0)], handler=b"H264")
        )
    no_frames = encode_avi(16, 16, 25.0, [_flat_jpeg(0)])
    cut = no_frames[: no_frames.index(b"movi") + 4]
    fixed = bytearray(cut)
    with pytest.raises(ValueError):
        parse_avi(bytes(fixed))                     # movi truncated


def test_multimodal_guard_decodes_avi_payloads(spark):
    avi = encode_avi(16, 16, 10.0, [_flat_jpeg(d) for d in (-400, 0, 400)])
    h264 = encode_avi(16, 16, 10.0, [_flat_jpeg(0)], handler=b"H264")
    from dqmtools_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_meta,
        extract_features,
    )

    rows = [
        (0, "video", bytearray(avi), "video/avi"),
        (1, "video", bytearray(h264), "video/avi"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = {
        r["media_id"]: (r["format"], r["width"], r["height"])
        for r in decode_media_meta(df).collect()
    }
    assert meta[0] == ("avi", 16, 16)
    got = {
        r["media_id"]: r["feature"]
        for r in extract_features(df, stub=False).collect()
    }
    assert got[1] is None                  # non-MJPEG degrades to null
    f = got[0]
    assert f is not None and len(f) == 16
    assert f[0] == 16.0 and f[2] == 3.0 and f[3] == 10.0
