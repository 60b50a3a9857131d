"""Pure-Python PNG codec (stdlib zlib only) — the real decode path for
the multimodal pipeline in a container without image libraries.

Supports non-interlaced 8-bit-per-sample images in the four common
color types (gray, gray+alpha, RGB, RGBA) with all five scanline
filters (None/Sub/Up/Average/Paeth).  Palette and 16-bit images raise
— at scale you would swap a C codec into the same UDF seam
(``operators/multimodal.py``); this module makes one codec path REAL
end-to-end: actual IDAT inflate, actual unfiltering, actual pixels.

The encoder exists so tests can round-trip arbitrary pixel arrays
through every filter type; it is also a legitimate tiny image sink.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes -> (width, height, channels, raw pixels row-major).

    Raises ValueError on malformed input and NotImplementedError on
    unsupported (palette / 16-bit / interlaced) variants.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} unsupported")
            if color not in _CHANNELS:
                raise NotImplementedError(f"color type {color} unsupported")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    stride = width * channels
    expected = (stride + 1) * height
    # bound the inflate to the declared pixel size: a crafted
    # decompression bomb (tiny IDAT inflating to GBs) must not be able
    # to exhaust worker memory before the size check runs
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or (d.unconsumed_tail or not d.eof):
        raise ValueError("IDAT length mismatch")

    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes | bytearray,
    width: int,
    height: int,
    channels: int,
    row_filters: list[int] | None = None,
) -> bytes:
    """Raw row-major 8-bit pixels -> PNG bytes.

    ``row_filters`` pins the per-row filter type (0-4); default all 0.
    Tests use mixed filters so the decoder's every unfilter branch is
    exercised by a genuine encode->decode round trip.
    """
    if channels not in _COLOR_TYPE:
        raise ValueError(f"channels={channels} unsupported")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    filters = row_filters or [0] * height
    if len(filters) != height:
        raise ValueError("row_filters length mismatch")

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        ftype = filters[y]
        enc = bytearray(line)
        if ftype == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (line[i] - line[i - channels]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                enc[i] = (line[i] - _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        raw.append(ftype)
        raw.extend(enc)
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )
