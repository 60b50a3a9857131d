"""FLAC decoder (Rice/fixed/LPC, stereo decorrelation, CRC-verified).

Ground truth: sample-exact numpy integer round trips through the
fixture encoder (real Rice coding, fixed predictors, all stereo
decorrelation modes), an LPC subframe HAND-BUILT bit by bit whose
recurrence is recomputed independently here, and CRC corruption tests
proving a flipped bit is a clean ValueError, not garbage samples.
"""

from __future__ import annotations

import numpy as np
import pytest

from dqmtools_spark.functions.flaccodec import (
    _crc8,
    _crc16,
    _MSBWriter,
    decode_flac,
    encode_flac,
    flac_features,
    parse_streaminfo,
)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2"])
def test_mono_roundtrip_sample_exact(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    x = rng.integers(-20000, 20000, 6000)
    sr, ch, out = decode_flac(encode_flac(8000, x, mode=mode, blocksize=1024))
    assert (sr, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], x)


def test_constant_blocks():
    c = np.full(5000, -1234)
    sr, ch, out = decode_flac(encode_flac(8000, c, mode="constant", blocksize=1000))
    assert np.array_equal(out[:, 0], c)


def test_fixed_predictor_actually_compresses():
    t = np.arange(20000)
    smooth = (8000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int64)
    b2 = encode_flac(8000, smooth, mode="fixed2")
    v = encode_flac(8000, smooth, mode="verbatim")
    sr, ch, out = decode_flac(b2)
    assert np.array_equal(out[:, 0], smooth)
    assert len(b2) < 0.7 * len(v)  # Rice on 2nd-order residuals wins


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(stereo_mode):
    rng = np.random.default_rng(11)
    left = rng.integers(-30000, 30000, 4000)
    right = left + rng.integers(-500, 500, 4000)  # correlated channels
    st = np.stack([left, right], axis=1)
    sr, ch, out = decode_flac(
        encode_flac(8000, st, stereo_mode=stereo_mode, blocksize=2048)
    )
    assert ch == 2 and np.array_equal(out, st)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    y = rng.integers(-lim, lim, 2000)
    sr, ch, out = decode_flac(
        encode_flac(16000, y, bps=bps, mode="fixed1", blocksize=512)
    )
    assert np.array_equal(out[:, 0], y)


def _handbuilt_frame(subframe_bits, blocksize, bps=16, sr=8000, n=None):
    """Wrap hand-written subframe bits in a valid mono FLAC stream."""
    n = blocksize if n is None else n
    streaminfo = bytearray()
    import struct as _s

    streaminfo += _s.pack(">HH", blocksize, blocksize)
    streaminfo += b"\x00" * 6
    bits = (sr << 44) | (0 << 41) | ((bps - 1) << 36) | n
    streaminfo += bits.to_bytes(8, "big")
    streaminfo += b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + bytes(streaminfo)
    w = _MSBWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)   # 16-bit blocksize at end
    w.write(0, 4)   # sr from streaminfo
    w.write(0, 4)   # 1 channel
    w.write(4, 3)   # 16-bit samples
    w.write(0, 1)
    w.write(0, 8)   # frame 0
    w.write(blocksize - 1, 16)
    w.align()
    w.write(_crc8(bytes(w.out)), 8)
    for v, nb in subframe_bits:
        w.write(v, nb)
    w.align()
    w.write(_crc16(bytes(w.out)), 16)
    return bytes(out) + bytes(w.out)


def test_lpc_subframe_hand_built():
    """LPC order 2, precision 6, shift 2, coefs [3, -1], warmup
    [100, 110], residuals [5, -3, 0, 7, -2, 1] — the expected samples
    are recomputed here with the recurrence in plain Python."""
    order, shift, coefs = 2, 2, [3, -1]
    warm = [100, 110]
    resid = [5, -3, 0, 7, -2, 1]
    blocksize = order + len(resid)
    bits = [(0, 1), (32 | (order - 1), 6), (0, 1)]          # type, no waste
    bits += [(v & 0xFFFF, 16) for v in warm]                 # warmup
    bits += [(6 - 1, 4), (shift & 0x1F, 5)]                  # precision, shift
    bits += [(c & 0x3F, 6) for c in coefs]                   # coefficients
    bits += [(0, 2), (0, 4), (14, 4)]                        # rice: p=14
    for v in resid:
        z = (abs(v) << 1) - (1 if v < 0 else 0)
        bits += [(1, (z >> 14) + 1), (z & 0x3FFF, 14)]       # unary + bits
    data = _handbuilt_frame(bits, blocksize)
    sr, ch, out = decode_flac(data)
    want = list(warm)
    for r in resid:
        acc = sum(c * want[-1 - j] for j, c in enumerate(coefs))
        want.append((acc >> shift) + r)
    assert out[:, 0].tolist() == want


def test_wasted_bits_shift_left():
    """CONSTANT subframe with 2 wasted bits: value coded at bps-2 and
    shifted left by 2 on output."""
    bits = [
        (0, 1), (0, 6),      # constant
        (1, 1), (0, 1), (1, 1),  # wasted flag + unary(1) -> wasted=2
        (300 & 0x3FFF, 14),  # value at 16-2 bits
    ]
    data = _handbuilt_frame(bits, blocksize=16)
    sr, ch, out = decode_flac(data)
    assert (out[:, 0] == 1200).all()


def test_crc_corruption_detected():
    x = np.arange(-500, 500, dtype=np.int64)
    good = encode_flac(8000, x, mode="fixed1", blocksize=1000)
    frame_start = parse_streaminfo(good)["frames_start"]
    bad = bytearray(good)
    bad[frame_start + 9] ^= 0x01  # flip a bit inside the frame body
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    hdr_bad = bytearray(good)
    hdr_bad[frame_start + 4] ^= 0x01  # flip inside the frame header
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr_bad))


def test_malformed_raises_cleanly():
    with pytest.raises(ValueError):
        decode_flac(b"NOTFLAC!")
    good = encode_flac(8000, np.arange(100, dtype=np.int64))
    with pytest.raises(ValueError):
        decode_flac(good[:30])   # truncated STREAMINFO
    with pytest.raises(ValueError):
        decode_flac(good[:50])   # truncated frame


def test_features_match_wav_layout():
    t = np.arange(8000)
    x = (0.5 * 32768 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    f = flac_features(encode_flac(8000, x, mode="fixed2"))
    assert len(f) == 16
    assert abs(f[0] - 1.0) < 1e-6 and f[1] == 8000.0 and f[2] == 1.0
    assert abs(f[3] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f[5] - 440.0) < 1.0


def test_multimodal_guard_decodes_flac_payloads(spark):
    t = np.arange(4000)
    x = (0.4 * 32768 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.int64)
    flac = encode_flac(8000, x, mode="fixed2", blocksize=1024)
    from dqmtools_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_meta,
        extract_features,
    )

    rows = [
        (0, "audio", bytearray(flac), "audio/flac"),
        (1, "audio", bytearray(b"fLaC" + b"\x00" * 30), "audio/flac"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = {r["media_id"]: r["format"] for r in decode_media_meta(df).collect()}
    assert meta == {0: "flac", 1: "flac"}
    got = {
        r["media_id"]: r["feature"]
        for r in extract_features(df, stub=False).collect()
    }
    assert got[1] is None
    f = got[0]
    assert f is not None and len(f) == 16
    assert f[1] == 8000.0 and abs(f[5] - 330.0) < 2.0
