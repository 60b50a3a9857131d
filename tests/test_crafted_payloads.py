"""Crafted/adversarial MEDIA payloads: the multimodal module's
contract is that one undecodable row must never fail the job, so every
decompression-bomb / deep-nesting / odd-but-spec-valid container shape
must either parse correctly or degrade to a null result — never raise
past the guards (ADVICE r4 items 1, 2 and 5).  Pure-Python tests (no
Spark session needed)."""

from __future__ import annotations

import struct

import pytest

from dqmtools_spark.functions.avicodec import avi_header_dims, encode_avi
from dqmtools_spark.functions.gifcodec import MAX_PIXELS, decode_gif
from dqmtools_spark.functions.mp4meta import parse_mp4_meta
from dqmtools_spark.operators.multimodal import (
    _parse_image_header,
    avi_video_features,
    gif_pixel_features,
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


# ------------------------------------------------- decompression bombs


def test_gif_claiming_12gb_canvas_is_rejected_before_allocation():
    # ~15 bytes that CLAIM 65535x65535 (~12.9 GB of RGB canvas)
    bomb = b"GIF89a" + struct.pack("<HH", 65535, 65535) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="pixel budget"):
        decode_gif(bomb)
    assert gif_pixel_features(bomb) is None  # guard degrades, not crashes
    assert 65535 * 65535 > MAX_PIXELS  # the test is actually over budget


def test_gif_frame_rect_bomb_is_rejected():
    # sane 2x2 screen, but an image descriptor claiming a 65535x65535
    # frame (lzw_decode would otherwise build a 4-billion-entry list)
    head = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
    gct = b"\x00" * 6  # 2-entry global color table
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 65535, 65535) + b"\x00"
    bomb = head + gct + desc + b"\x02\x00\x3b"
    with pytest.raises(ValueError, match="pixel budget"):
        decode_gif(bomb)
    assert gif_pixel_features(bomb) is None


# ------------------------------------------------- deep-nesting bombs


def test_mp4_thousand_nested_boxes_degrades_not_recurses():
    inner = b""
    for _ in range(1000):
        inner = _box(b"trak", inner)
    bomb = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(b"moov", inner)
    with pytest.raises(ValueError, match="nesting too deep"):
        parse_mp4_meta(bomb)
    # the header sniff catches it and degrades to format-only
    assert _parse_image_header(bomb) == ("mp4", None, None)


def test_avi_thousand_nested_lists_degrades_not_recurses():
    inner = b""
    for _ in range(1000):
        inner = _riff_chunk(b"LIST", b"odml" + inner)
    body = b"AVI " + inner
    bomb = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="nesting too deep"):
        avi_header_dims(bomb)
    assert _parse_image_header(bomb) == ("avi", None, None)
    assert avi_video_features(bomb) is None


# ------------------------------------- spec-valid-but-unusual containers


def test_avi_with_leading_junk_chunk_reports_real_dimensions():
    # spec-valid: a JUNK chunk before hdrl — fixed byte offsets 64/68
    # would read garbage; the chunk walker must find avih regardless
    # header walk never touches frame bytes, so an opaque frame is fine
    clean = encode_avi(8, 6, 10.0, [b"\xff\xd8 not decoded \xff\xd9"])
    junk = _riff_chunk(b"JUNK", b"\x00" * 36)
    body = clean[8:12] + junk + clean[12:]
    shifted = b"RIFF" + struct.pack("<I", len(body)) + body
    assert avi_header_dims(shifted) == (8, 6)
    assert _parse_image_header(shifted) == ("avi", 8, 6)
    # and the clean file still parses identically
    assert avi_header_dims(clean) == (8, 6)


# -------------------------------------------------- label selection


class _FakeModel:
    def __init__(self, labels):
        self.labels = [(lb, 1) for lb in labels]

    def predict_scores(self, text):
        return [float(i) for i in range(len(self.labels))]


def test_keep_scorer_requires_exact_label_match():
    from dqmtools_spark.operators.quality_model import fasttext_keep_scorer

    # '__label__not_keep' must NOT be picked for keep_label='keep'
    m = _FakeModel(["__label__not_keep", "__label__keep"])
    score = fasttext_keep_scorer(m, "keep")
    assert score("x") == 1.0  # index of the EXACT '__label__keep'

    with pytest.raises(ValueError, match="no label"):
        fasttext_keep_scorer(_FakeModel(["__label__not_keep"]), "keep")


# ---------------------------------------------------- WARC gzip bombs


def test_warc_gzip_bomb_member_is_bounded_and_counted():
    import gzip

    from dqmtools_spark.sources.warc import split_gzip_members, warc_gz_to_pages

    # a few-KB member claiming 4 MiB expanded: must abort at the cap,
    # not materialize the expansion
    bomb = gzip.compress(b"\x00" * (4 << 20))
    with pytest.raises(ValueError, match="exceeds"):
        list(split_gzip_members(bomb, max_member_bytes=1 << 20))
    # an ordinary member under the cap round-trips exactly
    ok = gzip.compress(b"abc" * 1000)
    assert list(split_gzip_members(ok, max_member_bytes=1 << 20)) == [
        b"abc" * 1000
    ]
    # and at the ingest layer the bomb is one corrupt-member COUNT,
    # never an exception (one bad record must not fail the task)
    rows, corrupt = warc_gz_to_pages(bomb)
    assert rows == [] and corrupt == 1
