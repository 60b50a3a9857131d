"""Latest-per-key (reference O2/O4).

Reference: ``dqmtools.py:96`` — ``sort_values('last_update',
ascending=False).drop_duplicates(["name"])`` and ``dqm_display.py:22-41``
(max (run,trigger) per (apa,plane)).  Spark-native: one window
``row_number``; a single hash-exchange on the key, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the row with the greatest ``order_col`` per key group.

    ``tiebreak`` columns (descending) make the choice deterministic when
    ``order_col`` ties — the pandas drop_duplicates keeps first-seen,
    which is nondeterministic in a distributed setting; we refuse to
    replicate that ambiguity.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
