"""Deterministic prescale sampling (reference P11).

Reference: ``ana_data_prescale`` / ``wvfm_data_prescale`` threaded
through ``dataframe_creator.py:32-65`` — keep every k-th unit.  The
rebuild must be reproducible across runs and cluster sizes, so it hashes
a stable key instead of using ``df.sample`` (whose output depends on
partitioning): ``pmod(xxhash64(key), k) == 0``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prescale(df: DataFrame, key: str | Column, k: int) -> DataFrame:
    """Keep a deterministic ~1/k of rows, stable under repartitioning."""
    if k <= 1:
        return df
    col = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(F.xxhash64(col), F.lit(k)) == 0)
