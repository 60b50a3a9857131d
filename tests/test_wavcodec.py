"""WAV decoder + audio features (round-4 stub-shrink).

Ground truth: numpy-generated signals with closed-form expectations
(a pure sine's RMS is amp/sqrt(2), its zero-crossing rate 2f/sr, its
spectral centroid f), sample-exact PCM round trips at every bit
depth, and the strong G.711 inverse property compress(expand(code))
== code over all 256 codes (mu-law's minus-zero code is the single
documented exception — both zero codes expand to 0).
"""

from __future__ import annotations

import numpy as np
import pytest

from dqmtools_spark.functions.wavcodec import (
    _alaw_compress,
    _alaw_expand,
    _mulaw_compress,
    _mulaw_expand,
    decode_wav,
    encode_wav,
    wav_features,
)


def _sine(freq, sr=8000, n=8000, amp=0.5):
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_int_pcm_roundtrip_sample_exact(bits):
    """Values on the exact quantization grid survive encode->decode
    bit-for-bit."""
    rng = np.random.default_rng(bits)
    q = 1 << (bits - 1)
    ints = rng.integers(-q, q, 500)
    x = ints.astype(np.float64) / q
    sr, ch, out = decode_wav(encode_wav(8000, x, bits=bits))
    assert (sr, ch) == (8000, 1)
    assert np.array_equal(out[:, 0] * q, ints.astype(np.float64))


def test_8bit_pcm_offset_binary():
    x = np.array([-1.0, -0.5, 0.0, 0.5, 127 / 128])
    sr, ch, out = decode_wav(encode_wav(8000, x, bits=8))
    assert np.allclose(out[:, 0], x, atol=1 / 128)
    # silence is exactly byte 128 -> exactly 0.0
    assert decode_wav(encode_wav(8000, np.zeros(4), bits=8))[2].max() == 0.0


@pytest.mark.parametrize("bits", [32, 64])
def test_float_pcm_roundtrip(bits):
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 300)
    sr, ch, out = decode_wav(encode_wav(44100, x, fmt="float", bits=bits))
    assert sr == 44100
    tol = 1e-7 if bits == 32 else 0.0
    assert np.allclose(out[:, 0], x, atol=tol)


def test_g711_compress_is_exact_inverse_of_expand():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(_alaw_compress(_alaw_expand(codes)), codes)
    mu = _mulaw_compress(_mulaw_expand(codes))
    bad = codes[mu != codes]
    assert bad.tolist() == [127]  # mu-law minus-zero -> plus-zero
    assert _mulaw_expand(np.array([127], np.uint8))[0] == 0.0
    assert _mulaw_expand(np.array([255], np.uint8))[0] == 0.0


@pytest.mark.parametrize("fmt", ["mulaw", "alaw"])
def test_g711_wav_decodes_within_quantization_error(fmt):
    x = _sine(440, amp=0.8)
    sr, ch, out = decode_wav(encode_wav(8000, x, fmt=fmt))
    # log-companded 8-bit: worst segment step ~ 1/32 of full scale
    assert np.abs(out[:, 0] - x).max() < 0.04
    assert np.corrcoef(out[:, 0], x)[0, 1] > 0.999


def test_stereo_and_chunk_walker():
    """Stereo frames interleave; unknown chunks (odd-sized, before
    data) are skipped with RIFF padding; extensible fmt resolves via
    its SubFormat GUID."""
    left, right = _sine(200, n=400), _sine(300, n=400)
    x = np.stack([left, right], axis=1)
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    wav = encode_wav(16000, x, bits=16, extensible=True, extra_chunk=extra)
    sr, ch, out = decode_wav(wav)
    assert (sr, ch) == (16000, 2)
    assert np.abs(out - x).max() < 1e-4


def test_sine_features_closed_form():
    """440 Hz sine at amp 0.5, 8 kHz, 1 s: duration 1.0, rms
    0.5/sqrt(2), zcr ~= 2*440/8000, centroid ~= 440 Hz, flat
    envelope."""
    wav = encode_wav(8000, _sine(440), fmt="float", bits=64)
    f = wav_features(wav)
    assert len(f) == 16
    assert abs(f[0] - 1.0) < 1e-6          # duration
    assert f[1] == 8000.0 and f[2] == 1.0  # sr, channels
    assert abs(f[3] - 0.5 / np.sqrt(2)) < 1e-3   # rms
    assert abs(f[4] - 2 * 440 / 8000) < 1e-3     # zcr
    assert abs(f[5] - 440.0) < 1.0               # centroid
    assert abs(f[7] - 0.5) < 1e-6                # peak
    assert np.allclose(f[8:], 1.0, atol=1e-2)    # flat RMS envelope


def test_envelope_localizes_energy():
    """A burst in the last eighth of the file shows up only in the
    final envelope bin."""
    x = np.zeros(8000)
    x[7000:] = _sine(500, n=1000, amp=0.9)
    f = wav_features(encode_wav(8000, x, fmt="float", bits=64))
    assert f[15] == 1.0 and all(v == 0.0 for v in f[8:14])


def test_malformed_and_unsupported_raise_cleanly():
    good = encode_wav(8000, _sine(100, n=64), bits=16)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(good[:40])                    # truncated data chunk
    adpcm = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    adpcm[fmt_at : fmt_at + 2] = (0x0002).to_bytes(2, "little")
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(adpcm))                 # MS ADPCM tag
    with pytest.raises(ValueError):
        wav_features(encode_wav(8000, np.zeros((0,)), bits=16))


def test_multimodal_guard_decodes_wav_payloads(spark):
    """stub=False feature extraction yields REAL audio features for
    WAV payloads and null for compressed codecs."""
    wav = encode_wav(8000, _sine(440), bits=16)
    adpcm = bytearray(wav)
    fmt_at = wav.index(b"fmt ") + 8
    adpcm[fmt_at : fmt_at + 2] = (0x0002).to_bytes(2, "little")
    from dqmtools_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_meta,
        extract_features,
    )

    rows = [
        (0, "audio", bytearray(wav), "audio/wav"),
        (1, "audio", bytes(adpcm), "audio/wav"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = {r["media_id"]: r["format"] for r in decode_media_meta(df).collect()}
    assert meta == {0: "wav", 1: "wav"}
    got = {
        r["media_id"]: r["feature"]
        for r in extract_features(df, stub=False).collect()
    }
    assert got[1] is None
    f = got[0]
    assert f is not None and len(f) == 16
    assert abs(f[0] - 1.0) < 1e-6 and f[1] == 8000.0
    assert abs(f[5] - 440.0) < 1.5
