"""Deterministic prescale sampling (reference P11).

Reference: ``ana_data_prescale`` / ``wvfm_data_prescale`` threaded
through ``dataframe_creator.py:32-65`` — keep every k-th unit.  The
rebuild must be reproducible across runs and cluster sizes, so it hashes
a stable key instead of using ``df.sample`` (whose output depends on
partitioning): ``pmod(xxhash64(key), k) == 0``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prescale(df: DataFrame, key: str | Column, k: int) -> DataFrame:
    """Keep a deterministic ~1/k of rows, stable under repartitioning."""
    if k <= 1:
        return df
    col = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(F.xxhash64(col), F.lit(k)) == 0)


def stratified_hash_sample(
    df: DataFrame, strata: list[str], key: str, k: int
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (training-mixture
    curation: "take K docs per language/source cell, reproducibly").

    Rank rows inside each stratum by ``md5(key)`` (a uniform,
    engine-portable permutation — the same md5-derived ordering the
    IVF/decontam oracles use) with the raw key as tiebreak, keep rank
    <= k.  Unlike ``df.sample``/``sampleBy`` the result is independent
    of partitioning and cluster size, and unlike fraction-based
    sampling it is EXACTLY k per cell (or the whole cell when smaller).

    Scale: one hash exchange on the strata + per-partition top-k sort;
    skewed strata are bounded by the window's single pass (no
    per-stratum collect).  Adds ``sample_rank`` (1-based).
    """
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
