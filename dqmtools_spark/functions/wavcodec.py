"""Pure-Python WAV (RIFF/WAVE) decoder — no external libraries.

Decoder scope (malformed input raises ``ValueError``, valid-but-
unsupported codecs raise ``NotImplementedError``; the multimodal guard
degrades both to a null feature, same contract as the image codecs):

- integer PCM at 8 (unsigned), 16, 24, 32 bits (signed little-endian),
- IEEE float PCM at 32 and 64 bits,
- G.711 mu-law and A-law (ITU closed-form expansion, table-free),
- any channel count; WAVE_FORMAT_EXTENSIBLE resolved via its
  SubFormat GUID; chunks in any order, odd-sized chunks padded per
  RIFF.

NOT supported: ADPCM, MP3-in-WAV, and other compressed codecs.

Samples come back as float64 in [-1, 1): integer PCM divides by
2^(bits-1) (8-bit is offset-binary, recentered first), so the mapping
is exact and invertible — the fixture encoder inverts it and tests
assert sample-exact round trips against numpy-generated signals.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 0x0001
_FMT_FLOAT = 0x0003
_FMT_ALAW = 0x0006
_FMT_MULAW = 0x0007
_FMT_EXTENSIBLE = 0xFFFE


def _mulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear in [-1, 1) (closed form, 14-bit)."""
    u = (~u.astype(np.int64)) & 0xFF
    sign = np.where(u & 0x80, -1.0, 1.0)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((2 * mant + 33) << exp) - 33  # 0 .. 8031
    return sign * mag / 8159.0


def _alaw_expand(a: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear in [-1, 1) (closed form, 13-bit)."""
    a = a.astype(np.int64) ^ 0x55
    sign = np.where(a & 0x80, -1.0, 1.0)
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, 2 * mant + 1, (2 * mant + 33) << (exp - 1))
    return sign * mag / 4096.0


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, samples) with samples a
    float64 array of shape (n_frames, n_channels) in [-1, 1)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE)")
    pos = 12
    fmt = None  # (format_tag, channels, sample_rate, bits)
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            tag, ch, sr, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == _FMT_EXTENSIBLE:
                if size < 40:
                    raise ValueError("extensible fmt chunk too small")
                tag = struct.unpack("<H", body[24:26])[0]  # SubFormat GUID head
            fmt = (tag, ch, sr, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            frames = _decode_samples(body, *fmt)
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if fmt is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    _tag, ch, sr, _bits = fmt
    return sr, ch, frames


def _decode_samples(body: bytes, tag: int, ch: int, sr: int, bits: int) -> np.ndarray:
    if ch == 0 or sr == 0:
        raise ValueError("zero channels or sample rate")
    if tag == _FMT_PCM:
        if bits == 8:
            x = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            if len(body) % 3:
                raise ValueError("24-bit data not a multiple of 3 bytes")
            b = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(body, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM unsupported")
    elif tag == _FMT_FLOAT:
        if bits == 32:
            x = np.frombuffer(body, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(body, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float PCM unsupported")
    elif tag == _FMT_MULAW:
        x = _mulaw_expand(np.frombuffer(body, dtype=np.uint8))
    elif tag == _FMT_ALAW:
        x = _alaw_expand(np.frombuffer(body, dtype=np.uint8))
    else:
        raise NotImplementedError(f"WAV format tag {tag:#06x} unsupported")
    if x.size % ch:
        raise ValueError("sample count not a multiple of channel count")
    return x.reshape(-1, ch)


def wav_features(data: bytes, n_hist: int = 8) -> np.ndarray:
    """16-dim audio feature vector over decoded WAV samples — see
    :func:`signal_features` for the layout."""
    sr, ch, frames = decode_wav(data)
    return signal_features(sr, frames, n_hist=n_hist)


def signal_features(sr: int, frames: np.ndarray, n_hist: int = 8) -> np.ndarray:
    """16-dim audio feature vector: [duration_sec, sample_rate,
    channels, rms, zero_crossing_rate, spectral_centroid_hz,
    spectral_rolloff85_hz, peak] + ``n_hist``-bin RMS-over-time
    envelope (each bin the RMS of its time slice, normalized by peak
    RMS) — all derived from the decoded samples with numpy only.
    ``frames``: float array (n, channels) in [-1, 1)."""
    ch = frames.shape[1]
    if frames.shape[0] == 0:
        raise ValueError("audio has no frames")
    mono = frames.mean(axis=1)
    n = mono.shape[0]
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    total = float(spec.sum())
    if total > 0:
        centroid = float((freqs * spec).sum() / total)
        rolloff = float(freqs[np.searchsorted(np.cumsum(spec), 0.85 * total)])
    else:
        centroid = rolloff = 0.0
    peak = float(np.abs(mono).max())
    edges = np.linspace(0, n, n_hist + 1).astype(int)
    env = np.array(
        [
            np.sqrt(np.mean(mono[a:b] ** 2)) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
    )
    env_peak = env.max()
    if env_peak > 0:
        env = env / env_peak
    vec = np.array(
        [n / sr, float(sr), float(ch), rms, zcr, centroid, rolloff, peak]
        + env.tolist(),
        dtype=np.float32,
    )
    return vec


# ------------------------------------------------------------ encoder


def _mulaw_compress(x: np.ndarray) -> np.ndarray:
    """Linear [-1,1) -> G.711 mu-law bytes (inverse of the expander:
    exact nearest-segment search over the closed form)."""
    mag = np.clip(np.abs(x) * 8159.0, 0, 8158.0) + 33.0
    exp = np.floor(np.log2(mag / 33.0)).astype(np.int64)
    exp = np.clip(exp, 0, 7)
    mant = np.clip((mag / (1 << exp) - 33) // 2, 0, 15).astype(np.int64)
    u = (np.where(x < 0, 0x80, 0x00) | (exp << 4) | mant).astype(np.int64)
    return ((~u) & 0xFF).astype(np.uint8)


def _alaw_compress(x: np.ndarray) -> np.ndarray:
    mag = np.clip(np.abs(x) * 4096.0, 0, 4095.0)
    exp = np.zeros_like(mag, dtype=np.int64)
    big = mag >= 32
    exp[big] = np.clip(np.floor(np.log2(mag[big] / 33.0)).astype(np.int64) + 1, 1, 7)
    scale = np.power(2.0, np.maximum(exp, 1) - 1)
    mant = np.where(
        exp == 0,
        np.clip((mag - 1) // 2, 0, 15),
        np.clip((mag / scale - 33) // 2, 0, 15),
    ).astype(np.int64)
    a = (np.where(x < 0, 0x80, 0x00) | (exp << 4) | mant).astype(np.int64)
    return (a ^ 0x55).astype(np.uint8)


def encode_wav(
    sample_rate: int,
    samples: np.ndarray,
    *,
    bits: int = 16,
    fmt: str = "pcm",
    extensible: bool = False,
    extra_chunk: bytes | None = None,
) -> bytes:
    """Fixture encoder: float samples (n_frames, ch) or (n,) in
    [-1, 1) -> WAV bytes.  ``fmt``: pcm | float | mulaw | alaw.
    ``extra_chunk`` injects an arbitrary chunk before data (LIST,
    odd-sized, ...) to exercise the chunk walker."""
    x = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if x.shape[0] == 1 and x.ndim == 2 and np.asarray(samples).ndim == 1:
        x = x.T
    ch = x.shape[1]
    flat = x.ravel()
    if fmt == "pcm":
        tag = _FMT_PCM
        if bits == 8:
            raw = (np.clip(np.round(flat * 128.0 + 128.0), 0, 255)).astype(np.uint8).tobytes()
        elif bits == 16:
            raw = np.clip(np.round(flat * 32768.0), -32768, 32767).astype("<i2").tobytes()
        elif bits == 24:
            v = np.clip(np.round(flat * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
            v = np.where(v < 0, v + (1 << 24), v)
            b = np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=1)
            raw = b.astype(np.uint8).tobytes()
        elif bits == 32:
            raw = np.clip(np.round(flat * (1 << 31)), -(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
        else:
            raise ValueError(f"unsupported pcm bits {bits}")
    elif fmt == "float":
        tag = _FMT_FLOAT
        raw = flat.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif fmt == "mulaw":
        tag, bits = _FMT_MULAW, 8
        raw = _mulaw_compress(flat).tobytes()
    elif fmt == "alaw":
        tag, bits = _FMT_ALAW, 8
        raw = _alaw_compress(flat).tobytes()
    else:
        raise ValueError(f"unknown fmt {fmt}")
    balign = ch * bits // 8
    if extensible:
        sub = struct.pack("<H", tag) + bytes(14)
        fmt_body = struct.pack(
            "<HHIIHH", _FMT_EXTENSIBLE, ch, sample_rate,
            sample_rate * balign, balign, bits,
        ) + struct.pack("<HHI", 22, bits, 0) + sub
    else:
        fmt_body = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, sample_rate * balign, balign, bits
        )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if extra_chunk is not None:
        chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
