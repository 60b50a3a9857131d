"""Count-min sketch: approximate per-key frequencies in sublinear
space — the heavy-hitter primitive behind hot-URL / hot-domain
detection at corpus scale (the skew diagnostics in ``operators/
skew.py`` decide WHERE to salt; a sketch is how you find the heavy
keys without a full exact count of 10^9 distinct keys).

Structure: d rows x w counters.  Every key increments one counter per
row, chosen by an independent Carter-Wegman hash
``((a_j * h + b_j) mod P31) mod w`` over the key's portable md5-60bit
(``functions/hashing.py`` — a, h < 2^31 so products stay exact in
int64 in every engine).  The estimate is the MIN over the d counters,
which can only OVER-estimate (collisions add, never subtract):
``exact <= est <= exact + eps·N`` with eps ~ e/w at confidence
1 - e^-d.  Published data structure (Cormode & Muthukrishnan 2005).

Scale shape: the build is explode(d) -> ONE map-side-combinable count
aggregate shuffling at most d·w rows (the sketch, a few KB),
regardless of input size; estimation broadcast-joins the sketch.
Merging shards/streams is counter-wise addition — the same groupBy —
so the sketch composes with incremental ingestion for free.  All
decisions are integer, so a DuckDB oracle replays build and estimate
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dqmtools_spark.functions.hashing import (
    P31,
    md5_hash60,
    universal_hash_consts,
)


def _rows_positions(key: Column, width: int, depth: int) -> Column:
    """array of (row j, position) structs for ``key``."""
    h = md5_hash60(key) % F.lit(P31)
    consts = universal_hash_consts(depth, tag="cms")
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                ((F.lit(a) * h + F.lit(b)) % F.lit(P31) % F.lit(width)).alias(
                    "pos"
                ),
            )
            for j, (a, b) in enumerate(consts)
        ]
    )


def cms_build(
    df: DataFrame, key: Column | str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Build the sketch: (j, pos, counter) rows, at most d·w of them."""
    key = F.col(key) if isinstance(key, str) else key
    ex = df.select(
        F.explode(_rows_positions(key, width, depth)).alias("_rp")
    )
    return (
        ex.select(F.col("_rp.j").alias("j"), F.col("_rp.pos").alias("pos"))
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key: Column | str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """One row per DISTINCT key in ``keys``: (key, cms_est) — the
    min-counter estimate.  Other columns are not carried and duplicate
    keys collapse; join the result back on the key to annotate a full
    table.  A key absent from the build still gets its collision mass
    (possibly 0 via the missing-counter coalesce) — the sketch never
    under-counts."""
    kc = F.col(key) if isinstance(key, str) else key
    ex = keys.select(
        kc.alias("_key"), F.explode(_rows_positions(kc, width, depth)).alias("_rp")
    ).select("_key", F.col("_rp.j").alias("j"), F.col("_rp.pos").alias("pos"))
    j = ex.join(broadcast(sketch), ["j", "pos"], "left")
    return (
        j.groupBy("_key")
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_est"))
        .withColumnRenamed("_key", key if isinstance(key, str) else "key")
    )


# ------------------------------------------------------------ HyperLogLog


def hll_field_bits(m: int) -> int:
    """Rank-field width for m registers: 60 md5 bits minus the
    register-index bits.  m must be a power of two (the register index
    is ``h mod m``, i.e. the low log2(m) bits)."""
    if m < 2 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    return 60 - m.bit_length() + 1


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant — the ONE definition,
    shared with the DuckDB oracle (``oracles.hll_users_sql``)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_registers(
    df: DataFrame, key: Column | str, m: int = 32
) -> DataFrame:
    """HyperLogLog register table: (register, max_rank), at most m
    rows (Flajolet et al. 2007).

    Register index = low log2(m) bits of the portable md5-60bit hash;
    rank = leading-zero count of the remaining (60 - log2(m))-bit
    field + 1, computed EXACTLY via the binary-string length
    (``bin(w)`` has no leading zeros in Spark and DuckDB alike — no
    float log2 anywhere), capped at the field width so the oracle's
    dyadic arithmetic stays in int64 (sum <= m * 2^field < 2^61 for
    any power-of-two m).  The build is one map-side-combinable MAX
    aggregate shuffling at most m rows; merging shards is
    register-wise MAX (same aggregate).
    """
    fb = hll_field_bits(m)
    key = F.col(key) if isinstance(key, str) else key
    h = md5_hash60(key)
    w = F.expr(f"h DIV {m}")
    rank = F.least(
        F.when(w == 0, F.lit(fb + 1)).otherwise(
            F.lit(fb + 1) - F.length(F.bin(w))
        ),
        F.lit(fb),
    )
    return (
        df.select(h.alias("h"))
        .select((F.col("h") % m).alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, m: int = 32) -> DataFrame:
    """Raw HLL cardinality estimate from an m-register table (m MUST
    match the build — it sets both the field width and alpha).

    The harmonic sum is computed as an EXACT integer,
    ``sum(2^(field - max_rank))`` plus ``2^field`` per never-touched
    register (every term is a dyadic integer because ranks are capped
    at the field width), so the only float in the pipeline is one
    fixed-shape division — bit-reproducible in any engine.  Raw
    estimator only (alpha·m²/harmonic-sum): the standard
    small/large-range corrections use ``ln``, whose last-ulp behavior
    is libm-specific, so they are deliberately left to callers that
    don't need cross-engine exactness.  Bias at cardinalities << m²
    is the documented HLL raw-estimator bias.
    """
    fb = hll_field_bits(m)
    return registers.agg(
        (
            F.lit(hll_alpha(m) * m * m)
            / (
                (
                    F.sum(
                        F.expr(
                            f"shiftleft(CAST(1 AS BIGINT),"
                            f" CAST({fb} - max_rank AS INT))"
                        )
                    )
                    + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << fb)
                ).cast("double")
                / F.lit(float(1 << fb))
            )
        ).alias("hll_raw")
    )
