"""Bloom-filter membership: "is this key (maybe) already in the
corpus?" without joining the corpus.

The incremental-crawl primitive: dedup a NEW batch against an existing
10^12-doc corpus.  A join against the corpus shuffles O(corpus); a
Bloom filter reduces the corpus to m bits once (a map-side-combinable
``bit_or`` aggregate over hashed bit positions — O(k·corpus) cheap
rows collapsing to m/63 words), after which every future batch probes
it with a BROADCAST join of the (tiny) word table.  Guarantee: no
false negatives — an exact duplicate is always flagged; false
positives are tunable via (m, k) and the probe stays "maybe".

All decisions are exact integer math over the portable md5-60bit
family (``functions/hashing.py``): double hashing
``pos_j = (h1 + j·h2) mod m`` with ``h2`` forced odd, words of 63 bits
(bit index = pos mod 63) so ``1 << bit`` never touches the int64 sign
bit in any engine.  ``j < k <= 7`` keeps ``h1 + j·h2 < 2^63``
(h1, h2 < 2^60) — overflow-free in Spark, DuckDB and Python alike,
so the DuckDB oracle replays the filter bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dqmtools_spark.functions.hashing import md5_hash60

WORD_BITS = 63  # avoid the int64 sign bit in every engine


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Explodable array of the k bit positions of ``key``."""
    if not 0 < k <= 7:
        raise ValueError("k must be in 1..7 to keep h1 + j*h2 < 2^63")
    h1 = md5_hash60(key)
    h2 = md5_hash60(F.concat(F.lit("bloom2:"), key)).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.pmod(h1 + j.cast("long") * h2, F.lit(m_bits)),
    )


def bloom_build(
    df: DataFrame, key: Column | str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the filter: (word_idx, word) rows, at most m_bits/63 of
    them — small enough to broadcast for any practical m."""
    key = F.col(key) if isinstance(key, str) else key
    pos = df.select(F.explode(_positions(key, m_bits, k)).alias("_pos"))
    return (
        pos.select(
            F.expr(f"_pos DIV {WORD_BITS}").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {WORD_BITS} AS INT))")
            .alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    words: DataFrame,
    key: Column | str,
    id_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """One row per DISTINCT ``id_col``: (id_col, maybe_member) — True
    iff ALL k bits are set (no false negatives; false-positive rate
    ~ (1-e^{-kn/m})^k).  Other probe columns are not carried; join the
    result back on ``id_col`` to annotate a full table.

    Plan: explode k positions, BROADCAST-join the word table, bool_and
    per probe id — map-only against the corpus, one small exchange on
    the probe side.
    """
    key = F.col(key) if isinstance(key, str) else key
    pos = probe.select(
        F.col(id_col), F.explode(_positions(key, m_bits, k)).alias("_pos")
    ).withColumn("_wi", F.expr(f"_pos DIV {WORD_BITS}"))
    j = pos.join(broadcast(words), pos["_wi"] == words["word_idx"], "left")
    bit_set = F.expr(
        f"(shiftright(coalesce(word, CAST(0 AS BIGINT)),"
        f" CAST(_pos % {WORD_BITS} AS INT)) & 1) = 1"
    )
    return j.groupBy(id_col).agg(F.bool_and(bit_set).alias("maybe_member"))
