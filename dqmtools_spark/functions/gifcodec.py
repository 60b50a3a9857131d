"""Pure-Python GIF decoder (87a/89a, first frame) — no external
libraries.

Decoder scope (malformed input raises ``ValueError`` and is degraded
to a null feature by the multimodal guard, same contract as
``pngcodec``/``jpegcodec``):

- GIF87a and GIF89a, global and local color tables,
- full LZW decompression: variable code width 3-12 bits LSB-first,
  dictionary growth, the KwKwK self-reference case, clear-code resets
  (both explicit and the encoder-side 4096 overflow reset), deferred
  clear (dictionary full, no reset),
- data split across arbitrary sub-block boundaries,
- interlaced frames (the 8/8/4/2 four-pass row order),
- graphic control extension: transparency index honored when
  compositing the first frame onto the logical screen,
- first frame only: animation beyond frame 1 is out of scope for a
  feature extractor — the composited first frame IS what a viewer
  shows at t=0.

The fixture encoder (``encode_gif``) is a REAL LZW compressor (greedy
longest-match, same code-width schedule), so decoder tests exercise
genuine dictionary dynamics; correctness is still anchored by a
hand-packed byte-exact stream in the tests, not only the round trip.

Semantics analog: the reference decodes opaque per-row payloads with
external unpackers (``dump_pds_ana_info.py:125-163``); the codec is
in-repo because the container has no image libraries.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- LZW


class _LSBReader:
    """LSB-first bit reader over the concatenated sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.buf & ((1 << width) - 1)
        self.buf >>= width
        self.nbits -= width
        return v


class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW: returns exactly ``n_pixels`` palette indices."""
    if not (2 <= min_code_size <= 8):
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LSBReader(data)
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]  # clear/end slots
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            # the decoder runs one dictionary entry BEHIND the encoder
            # (it learns an entry's last symbol only from the next
            # code), so it must widen one entry early: at 2^width - 1,
            # not 2^width — the classic LZW "early change" off-by-one
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"LZW data ends early: {len(out)}/{n_pixels}")
    return out[:n_pixels]


def lzw_encode(min_code_size: int, indices: list[int], clear_every: int = 0) -> bytes:
    """Real greedy LZW compressor (fixture side).  ``clear_every``
    forces a clear code after that many emissions — 0 means only the
    mandatory initial clear and the 4096-overflow reset."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _LSBWriter()
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, width)
    seq: tuple[int, ...] = ()
    emitted = 0

    def reset():
        nonlocal table, next_code, width
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1

    for idx in indices:
        if idx >= clear:
            raise ValueError(f"index {idx} exceeds {min_code_size}-bit palette")
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        w.write(table[seq], width)
        emitted += 1
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder widens when its table length hits 1<<width; its
            # table length tracks next_code exactly (literals + clear +
            # end + added entries), so the same test keeps codes in sync
            if next_code == (1 << width) and width < 12:
                width += 1
        else:  # table full: reset (what real encoders do)
            w.write(clear, width)
            reset()
        if clear_every and emitted % clear_every == 0:
            w.write(clear, width)
            reset()
        seq = (idx,)
    if seq:
        w.write(table[seq], width)
    w.write(end, width)
    return w.flush()


# ------------------------------------------------------------ decoder

# pixel budget for untrusted corpora: 64 MP (~192 MB of RGB canvas) is
# far above any real web GIF; headers claiming more are rejected as
# decompression bombs BEFORE allocation
MAX_PIXELS = 64_000_000

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Stored row order -> display row order (GIF 8/8/4/2 passes)."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """GIF bytes -> (width, height, 3, row-major RGB pixels) of the
    first frame composited onto the logical screen (background color
    where the frame does not cover or is transparent)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise ValueError("zero-area GIF")
    if w * h > MAX_PIXELS:
        # decompression-bomb guard: a ~25-byte GIF can CLAIM
        # 65535x65535 (~12.9 GB of RGB canvas) — reject before
        # allocating so the multimodal guard degrades it to a null
        # feature instead of an executor-killing MemoryError
        raise ValueError(f"GIF claims {w}x{h} > {MAX_PIXELS} pixel budget")
    packed, bg_index = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        canvas[:, :] = list(gct[3 * bg_index : 3 * bg_index + 3])
    transparent = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            subs, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(subs) >= 4 and subs[0] & 0x01:
                transparent = subs[3]
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block {block:#x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        if fw == 0 or fh == 0:
            raise ValueError("zero-area GIF frame")
        if fw * fh > MAX_PIXELS:
            # same bomb guard for the frame rect (lzw_decode would
            # otherwise build an fw*fh-entry Python list)
            raise ValueError(
                f"GIF frame claims {fw}x{fh} > {MAX_PIXELS} pixel budget"
            )
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            palette = data[pos : pos + 3 * n]
            pos += 3 * n
        if palette is None:
            raise ValueError("frame has neither local nor global palette")
        if pos >= len(data):
            raise ValueError("missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = np.array(lzw_decode(mcs, lzw, fw * fh), dtype=np.int32).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) * 3 + 3 > len(palette):
            raise ValueError("palette index out of range")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        rgb = pal[idx]
        # composite: clip the frame rect to the logical screen
        y1, x1 = min(top + fh, h), min(left + fw, w)
        if top >= h or left >= w:
            return w, h, 3, canvas.tobytes()
        vis = rgb[: y1 - top, : x1 - left]
        if transparent is not None:
            mask = idx[: y1 - top, : x1 - left] != transparent
            region = canvas[top:y1, left:x1]
            region[mask] = vis[mask]
        else:
            canvas[top:y1, left:x1] = vis
        return w, h, 3, canvas.tobytes()
    raise ValueError("GIF ended without image data")


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        out += data[pos : pos + n]
        pos += n


# ------------------------------------------------------------ encoder


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[int],
    *,
    left: int = 0,
    top: int = 0,
    frame_w: int | None = None,
    frame_h: int | None = None,
    interlace: bool = False,
    local_palette: bool = False,
    bg_index: int = 0,
    transparent: int | None = None,
    sub_block_size: int = 255,
    clear_every: int = 0,
) -> bytes:
    """Single-frame GIF89a fixture from palette indices.

    ``indices`` covers the frame rect (``frame_w`` x ``frame_h``,
    default the full screen) in DISPLAY row order; interlacing
    reorders rows on emission so the decoder must undo it."""
    fw = width if frame_w is None else frame_w
    fh = height if frame_h is None else frame_h
    if len(indices) != fw * fh:
        raise ValueError("index count != frame area")
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1) if n > 2 else 0
    while (2 << size_field) < n:
        size_field += 1
    n_slots = 2 << size_field
    pal_bytes = bytearray()
    for (r, g, b) in palette:
        pal_bytes += bytes((r, g, b))
    pal_bytes += b"\x00" * (3 * (n_slots - n))
    mcs = max(2, (n_slots - 1).bit_length())

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    gct_flag = 0x00 if local_palette else 0x80
    out += bytes([gct_flag | size_field, bg_index, 0])
    if not local_palette:
        out += pal_bytes
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
    ipacked = (0x80 | size_field) if local_palette else 0x00
    if interlace:
        ipacked |= 0x40
    out += bytes([ipacked])
    if local_palette:
        out += pal_bytes
    arr = np.asarray(indices, dtype=np.int32).reshape(fh, fw)
    if interlace:
        rows = [arr[y] for start, step in _INTERLACE_PASSES for y in range(start, fh, step)]
        arr = np.stack(rows)
    out += bytes([mcs])
    lzw = lzw_encode(mcs, [int(v) for v in arr.ravel()], clear_every=clear_every)
    for i in range(0, len(lzw), sub_block_size):
        chunk = lzw[i : i + sub_block_size]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
