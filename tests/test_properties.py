"""Property-based checks (SURVEY §5.4): status-fold lattice laws and
prescale determinism.  Driver-side properties use hypothesis; the
Spark-side determinism check compares across different partitionings.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dqmtools_spark.rules.core import fold_status
from dqmtools_spark.schemas import BAD, INVALID, OK, WARNING

STATUS = st.sampled_from([INVALID, BAD, OK, WARNING])


@given(st.lists(STATUS, max_size=20))
def test_fold_order_invariant(statuses):
    assert fold_status(statuses) == fold_status(list(reversed(statuses)))
    assert fold_status(statuses) == fold_status(sorted(statuses))


@given(st.lists(STATUS, max_size=20), STATUS)
def test_fold_monotone_under_append(statuses, extra):
    """Adding a result can only keep or worsen the fold (lattice law:
    BAD dominates WARNING dominates OK, dqmtools.py:106-120)."""
    rank = {OK: 0, WARNING: 1, BAD: 2}
    before = fold_status(statuses)
    after = fold_status(statuses + [extra])
    assert rank[after] >= rank[before]


@given(st.lists(STATUS, min_size=1, max_size=20))
def test_fold_dominance(statuses):
    folded = fold_status(statuses)
    if any(s in (BAD, INVALID) for s in statuses):
        assert folded == BAD
    elif any(s == WARNING for s in statuses):
        assert folded == WARNING
    else:
        assert folded == OK


@settings(deadline=None, max_examples=10)
@given(st.integers(min_value=1, max_value=13))
def test_prescale_same_k_same_subset(spark, k):
    """P11 determinism: the kept subset is a pure function of (key, k),
    independent of partitioning — a re-run or a different cluster size
    samples the SAME units (unlike df.sample)."""
    from dqmtools_spark.operators.sampling import prescale

    base = spark.range(500).withColumnRenamed("id", "key")
    a = {r["key"] for r in prescale(base.repartition(2), "key", k).collect()}
    b = {r["key"] for r in prescale(base.repartition(7), "key", k).collect()}
    assert a == b
    assert 0 < len(a) < 500 or k == 1


# ----------------------------------------------------- spectral (F9)


def test_power_spectrum_matches_numpy_fft(spark):
    """The Arrow-batched power spectrum must equal a direct
    numpy.fft.rfft computation for arbitrary (seeded) signals, and
    handle nulls and ragged lengths."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqmtools_spark.functions.spectral import power_spectrum_udf

    rng = np.random.default_rng(17)
    rows = []
    for i in range(40):
        n = 32 if i % 3 else 24              # ragged batch coverage
        rows.append((i, rng.standard_normal(n).tolist()))
    rows.append((99, None))
    df = spark.createDataFrame(rows, "id long, sig array<double>")
    got = {r["id"]: r["ps"] for r in
           df.select("id", power_spectrum_udf(F.col("sig")).alias("ps")).collect()}
    assert got[99] is None
    for i, sig in rows[:-1]:
        want = (np.abs(np.fft.rfft(np.asarray(sig))) ** 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-12, atol=1e-12)


def test_spectral_peak_recovers_tone_frequency(spark):
    """Closed-form law: a pure integer-frequency cosine of amplitude a
    peaks at its own bin with power (a*n/2)^2."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqmtools_spark.functions.spectral import (
        power_spectrum_udf,
        spectral_peak,
        synth_tone,
    )

    df = spark.range(1, 15).select(F.col("id").alias("f"))
    sig = synth_tone(F.col("f"), n=32, second_freq=15, second_amp=0.25)
    ps = df.withColumn("_ps", power_spectrum_udf(sig))
    peak_bin, peak_power = spectral_peak(F.col("_ps"))
    out = ps.select("f", peak_bin.alias("b"), peak_power.alias("p")).collect()
    for r in out:
        assert r["b"] == r["f"]
        assert abs(r["p"] - 256.0) < 1e-9


# ------------------------------------------------ round-4 codec laws


@settings(deadline=None, max_examples=40)
@given(
    st.integers(min_value=2, max_value=8),
    st.lists(st.integers(min_value=0, max_value=255), max_size=600),
    st.integers(min_value=0, max_value=9),
)
def test_lzw_roundtrip_law(mcs, raw, clear_every):
    """lzw_decode(lzw_encode(x)) == x for any index stream within the
    palette, any code size, any forced-clear cadence."""
    from dqmtools_spark.functions.gifcodec import lzw_decode, lzw_encode

    idx = [v % (1 << mcs) for v in raw]
    enc = lzw_encode(mcs, idx, clear_every=clear_every)
    assert lzw_decode(mcs, enc, len(idx)) == idx


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.integers(min_value=-(1 << 15), max_value=(1 << 15) - 1),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from(["verbatim", "fixed0", "fixed1", "fixed2"]),
    st.sampled_from([64, 128, 4096]),
)
def test_flac_roundtrip_law(samples, mode, blocksize):
    """decode(encode(x)) == x sample-exactly for any 16-bit signal,
    any subframe mode, any block size."""
    import numpy as np

    from dqmtools_spark.functions.flaccodec import decode_flac, encode_flac

    x = np.asarray(samples, dtype=np.int64)
    _sr, _ch, out = decode_flac(
        encode_flac(8000, x, mode=mode, blocksize=blocksize)
    )
    assert np.array_equal(out[:, 0], x)


@settings(deadline=None, max_examples=15)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_progressive_equals_baseline_law(seed):
    """For ANY coefficient content, decoding the progressive encoding
    equals decoding the baseline encoding — the two frame types share
    one pixel pipeline and one truth."""
    import numpy as np

    from dqmtools_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg_from_coeffs,
        encode_progressive_jpeg_from_coeffs,
    )

    rng = np.random.default_rng(seed)
    blocks = []
    for _by in range(2):
        row = []
        for _bx in range(2):
            b = np.zeros((8, 8), dtype=int)
            n_ac = int(rng.integers(0, 20))
            b[0, 0] = int(rng.integers(-500, 500))
            for _ in range(n_ac):
                b[int(rng.integers(0, 8)), int(rng.integers(0, 8))] = int(
                    rng.integers(-200, 200)
                )
            row.append(b)
        blocks.append(row)
    comp = [{"id": 1, "h": 1, "v": 1, "tq": 0, "blocks": blocks}]
    scans = [
        {"comps": [1], "ss": 0, "se": 0, "ah": 0, "al": 2},
        {"comps": [1], "ss": 0, "se": 0, "ah": 2, "al": 1},
        {"comps": [1], "ss": 0, "se": 0, "ah": 1, "al": 0},
        {"comps": [1], "ss": 1, "se": 9, "ah": 0, "al": 1},
        {"comps": [1], "ss": 10, "se": 63, "ah": 0, "al": 1},
        {"comps": [1], "ss": 1, "se": 9, "ah": 1, "al": 0},
        {"comps": [1], "ss": 10, "se": 63, "ah": 1, "al": 0},
    ]
    base = decode_jpeg(encode_jpeg_from_coeffs(16, 16, comp, {0: [1] * 64}))
    prog = decode_jpeg(
        encode_progressive_jpeg_from_coeffs(16, 16, comp, {0: [1] * 64}, scans)
    )
    assert base == prog


@settings(deadline=None, max_examples=30)
@given(
    st.lists(
        st.integers(min_value=-(1 << 15), max_value=(1 << 15) - 1),
        min_size=1,
        max_size=300,
    )
)
def test_wav_pcm16_roundtrip_law(ints):
    """16-bit PCM WAV encode->decode is the identity on the
    quantization grid."""
    import numpy as np

    from dqmtools_spark.functions.wavcodec import decode_wav, encode_wav

    x = np.asarray(ints, dtype=np.float64) / 32768.0
    _sr, _ch, out = decode_wav(encode_wav(8000, x, bits=16))
    assert np.array_equal(out[:, 0] * 32768.0, np.asarray(ints, dtype=np.float64))
