"""Pure-Python AVI (RIFF) container parser + MJPEG video decode.

Decoder scope (malformed input raises ``ValueError``, valid-but-
unsupported codecs raise ``NotImplementedError``; the multimodal
guard degrades both to a null feature):

- RIFF 'AVI ' container: LIST hdrl (avih main header, strl per
  stream with strh/strf), LIST movi with per-frame '##dc'/'##db'
  chunks (odd sizes RIFF-padded), idx1 ignored,
- Motion-JPEG ('MJPG' handler): every sampled frame is a complete
  JPEG decoded by ``functions.jpegcodec.decode_jpeg`` — so baseline
  AND progressive frames both work,
- frame SAMPLING, not full decode: features need k evenly-spaced
  frames, and at 100 TB the whole point is never to touch the other
  ones (the container walk is offset arithmetic only).

NOT supported: any other video codec (no external libraries in this
container — that remainder stays honestly stubbed).

Semantics analog: the reference decodes opaque per-row payloads with
external unpackers (``dump_pds_ana_info.py:125-163``).
"""

from __future__ import annotations

import struct

import numpy as np

from dqmtools_spark.functions.jpegcodec import decode_jpeg


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size); RIFF pads odd sizes."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def _find_avih(data: bytes, pos: int, end: int, depth: int = 0):
    """First avih chunk body (as the 10 unpacked dwords) found by a
    real chunk walk, or None.  hdrl precedes movi, so this returns
    before touching frame data."""
    if depth > 32:
        raise ValueError("LIST nesting too deep")
    for cid, start, size in _walk_chunks(data, pos, end):
        if cid == b"avih" and size >= 40:
            return struct.unpack("<10I", data[start : start + 40])
        if cid == b"LIST":
            found = _find_avih(data, start + 4, start + size, depth + 1)
            if found is not None:
                return found
    return None


def avi_header_dims(data: bytes) -> tuple[int | None, int | None]:
    """Metadata-only fast path: locate avih via the chunk walker (so
    spec-valid files with a leading JUNK or extra chunk parse
    correctly — fixed byte offsets only hold when hdrl/avih come
    first) and return (dwWidth, dwHeight); (None, None) when absent."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    vals = _find_avih(data, 12, len(data))
    if vals is None:
        return None, None
    return (int(vals[8]) or None, int(vals[9]) or None)


def parse_avi(data: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, handler,
    frame_spans: [(start, size), ...]} for the first video stream."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI )")
    width = height = None
    fps = None
    n_frames = 0
    handler = None
    vids_stream = None
    stream_idx = -1
    frame_spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int, depth: int = 0) -> None:
        nonlocal width, height, fps, n_frames, handler, vids_stream, stream_idx
        # real AVI LIST trees nest ~3 deep; a crafted file with ~1000
        # nested LISTs would otherwise hit Python's recursion limit and
        # escape the decode guards (ValueError is caught and degraded)
        if depth > 32:
            raise ValueError("LIST nesting too deep")
        for cid, start, size in _walk_chunks(data, pos, end):
            if cid == b"LIST":
                ltype = data[start : start + 4]
                if ltype == b"strl":
                    stream_idx += 1
                walk(start + 4, start + size, depth + 1)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("avih too small")
                vals = struct.unpack("<10I", data[start : start + 40])
                usec_pf, total, w, h = vals[0], vals[4], vals[8], vals[9]
                n_frames = total
                width, height = w, h
                if usec_pf:
                    fps = 1e6 / usec_pf
            elif cid == b"strh":
                if size < 32:
                    raise ValueError("strh too small")
                fcc_type = data[start : start + 4]
                if fcc_type == b"vids" and vids_stream is None:
                    vids_stream = stream_idx
                    handler = data[start + 4 : start + 8].decode(
                        "ascii", "replace"
                    )
                    scale, rate = struct.unpack(
                        "<II", data[start + 20 : start + 28]
                    )
                    if scale and rate:
                        fps = rate / scale
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                if vids_stream is not None and cid[:2] == b"%02d" % vids_stream:
                    frame_spans.append((start, size))

    # movi frames appear after hdrl, so one pass collects everything
    walk(12, len(data))
    if width is None or vids_stream is None:
        raise ValueError("AVI has no video stream headers")
    if not frame_spans:
        raise ValueError("AVI has no video frames")
    return {
        "width": int(width),
        "height": int(height),
        "fps": float(fps) if fps else None,
        "n_frames": int(n_frames) or len(frame_spans),
        "handler": handler,
        "frame_spans": frame_spans,
    }


def sample_frames(data: bytes, k: int = 4) -> list[tuple[int, int, int, bytes]]:
    """Decode k evenly-spaced MJPEG frames -> [(w, h, ch, pixels)].
    Only the sampled frames' bytes are touched."""
    info = parse_avi(data)
    if (info["handler"] or "").upper() not in ("MJPG", "MJPA", "JPEG"):
        raise NotImplementedError(
            f"video codec {info['handler']!r} unsupported (MJPEG only)"
        )
    spans = info["frame_spans"]
    k = min(k, len(spans))
    picks = sorted({int(round(i * (len(spans) - 1) / max(k - 1, 1))) for i in range(k)})
    out = []
    for i in picks:
        start, size = spans[i]
        out.append(decode_jpeg(data[start : start + size]))
    return out


def avi_features(data: bytes, k: int = 4, n_hist: int = 6) -> np.ndarray:
    """16-dim video feature vector: [width, height, n_frames, fps,
    duration_sec, n_sampled, mean_luma, std_luma,
    mean_abs_frame_diff, max_abs_frame_diff] + ``n_hist``-bin luma
    histogram of the first sampled frame."""
    info = parse_avi(data)
    frames = sample_frames(data, k=k)
    lumas = []
    for (w, h, c, pix) in frames:
        arr = np.frombuffer(pix, np.uint8).reshape(h, w, c).astype(np.float64)
        lumas.append(arr.mean(axis=2))
    stack = np.stack(lumas)
    diffs = (
        np.abs(np.diff(stack, axis=0)).mean(axis=(1, 2))
        if len(lumas) > 1
        else np.zeros(1)
    )
    fps = info["fps"] or 0.0
    hist, _ = np.histogram(lumas[0], bins=n_hist, range=(0, 256))
    vec = np.array(
        [
            float(info["width"]),
            float(info["height"]),
            float(info["n_frames"]),
            fps,
            info["n_frames"] / fps if fps else 0.0,
            float(len(frames)),
            float(stack.mean()),
            float(stack.std()),
            float(diffs.mean()),
            float(diffs.max()),
        ]
        + (hist / lumas[0].size).tolist(),
        dtype=np.float32,
    )
    return vec


# ------------------------------------------------------------ encoder


def encode_avi(
    width: int,
    height: int,
    fps: float,
    jpeg_frames: list[bytes],
    *,
    handler: bytes = b"MJPG",
    extra_stream: bool = False,
) -> bytes:
    """Fixture encoder: complete JPEG payloads -> a spec-shaped MJPEG
    AVI (hdrl with avih + strl, movi with 00dc chunks, no idx1).
    ``extra_stream`` prepends a dummy audio stream so the video stream
    lands at index 1 and frame ids become '01dc' — exercising the
    stream-number plumbing."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    usec_pf = int(round(1e6 / fps)) if fps else 0
    avih = struct.pack(
        "<10I4I",
        usec_pf, 0, 0, 0, len(jpeg_frames), 0,
        2 if extra_stream else 1, 0, width, height, 0, 0, 0, 0,
    )
    strl_parts = b""
    if extra_stream:
        a_strh = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0, 0, 0, 0)
            + struct.pack("<4h", 0, 0, 0, 0)
        )
        strl_parts += list_chunk(
            b"strl", chunk(b"strh", a_strh) + chunk(b"strf", b"\x00" * 16)
        )
    scale, rate = 1000, int(round(fps * 1000))
    v_strh = (
        b"vids" + handler
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0, scale, rate, 0, len(jpeg_frames), 0, 0, 0,
        )
        + struct.pack("<4h", 0, 0, width, height)
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl_parts += list_chunk(b"strl", chunk(b"strh", v_strh) + chunk(b"strf", bmih))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl_parts)
    sid = b"01dc" if extra_stream else b"00dc"
    movi = list_chunk(b"movi", b"".join(chunk(sid, f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
