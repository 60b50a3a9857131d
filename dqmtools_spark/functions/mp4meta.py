"""MP4/ISO-BMFF container METADATA parser — box walk only.

Real byte-level parsing of the box tree (ftyp/moov/mvhd/trak/tkhd,
32- and 64-bit box sizes) for format detection, dimensions and
duration.  FRAME decode stays honestly stubbed: the payload codecs
(H.264/H.265/AAC) need external libraries this container does not
have, so ``extract_features`` yields the null feature for MP4 — but
``decode_media_meta`` reports genuine width/height/duration, the same
header-is-real / pixels-are-stubbed split the PNG path had before its
codec landed.
"""

from __future__ import annotations

import struct


def _boxes(data: bytes, pos: int, end: int):
    """Yield (box_type, body_start, body_end); handles largesize."""
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing container
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(data: bytes) -> tuple[int | None, int | None, float | None]:
    """MP4 bytes -> (width, height, duration_seconds); None per field
    when the corresponding box is absent.  Raises ValueError when the
    data is not ISO-BMFF at all."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    width = height = None
    duration = None

    def walk(pos: int, end: int, depth: int = 0) -> None:
        nonlocal width, height, duration
        # real ISO-BMFF trees nest ~6 deep; a crafted file with ~1000
        # nested boxes would otherwise hit Python's recursion limit and
        # escape the decode guards (ValueError is caught and degraded)
        if depth > 32:
            raise ValueError("box nesting too deep")
        for btype, body, bend in _boxes(data, pos, end):
            if btype in (b"moov", b"trak"):
                walk(body, bend, depth + 1)
            elif btype == b"mvhd" and bend - body >= 20:
                ver = data[body]
                if ver == 1 and bend - body >= 32:
                    ts = struct.unpack(">I", data[body + 20 : body + 24])[0]
                    dur = struct.unpack(">Q", data[body + 24 : body + 32])[0]
                else:
                    ts = struct.unpack(">I", data[body + 12 : body + 16])[0]
                    dur = struct.unpack(">I", data[body + 16 : body + 20])[0]
                if ts:
                    duration = dur / ts
            elif btype == b"tkhd":
                ver = data[body]
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= bend:
                    w16, h16 = struct.unpack(">II", data[off : off + 8])
                    w, h = w16 >> 16, h16 >> 16  # 16.16 fixed point
                    if w and h and width is None:
                        width, height = w, h

    walk(0, len(data))
    return width, height, duration


def encode_mp4_meta(
    width: int,
    height: int,
    duration_sec: float,
    timescale: int = 600,
    version: int = 0,
    largesize_moov: bool = False,
) -> bytes:
    """Fixture: a headers-only MP4 (ftyp + moov/mvhd/trak/tkhd + empty
    mdat) — enough container for the metadata walker; no media data."""

    def box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
        if largesize:
            return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
        return struct.pack(">I", 8 + len(body)) + btype + body

    dur = int(round(duration_sec * timescale))
    if version == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(">IQ", timescale, dur) + b"\x00" * 80
        tk_pre = bytes([1, 0, 0, 7]) + b"\x00" * 84
    else:
        mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + struct.pack(">II", timescale, dur) + b"\x00" * 80
        tk_pre = bytes([0, 0, 0, 7]) + b"\x00" * 72
    tkhd = tk_pre + struct.pack(">II", width << 16, height << 16)
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)),
               largesize=largesize_moov)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + box(b"mdat", b"")
