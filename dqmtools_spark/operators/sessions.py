"""Gap-based sessionization: split each key's ordered event stream into
sessions wherever the inter-event gap exceeds a threshold.

The classic web-analytics / training-log primitive (reference analogue:
the run/time grouping the DQM display derives from record timestamps,
``dqm_display.py`` latest-view grouping — here generalized to a
configurable inactivity gap).

Plan shape: ONE hash exchange on the key, then two windows over the
same (key, ts, tiebreak) sort order — ``lag`` to flag session starts,
running ``sum`` to number them — which Spark executes as a single sort
+ two WindowExec passes without re-shuffling (both windows share the
partitioning).  Per-session aggregation after that groups on
(key, session_seq), which is a prefix-compatible second exchange.  At
100 TB this is the minimum possible: any sessionizer must co-locate a
key's events and order them once.

All gap arithmetic is integer microseconds, so the boundary decision
``gap > threshold`` is exact and engine-portable (DuckDB:
``epoch_us``) — no float time deltas anywhere.  Naive
(``timestamp_ntz``) columns are measured with ``timestampdiff`` from
the naive epoch, NOT by casting to an instant first: the cast routes
through the session timezone, and a DST transition inside a gap would
shift it by an hour.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_micros_fn(df: DataFrame, ts_col: str) -> Callable[[Column], Column]:
    """Exact integer-microseconds view of ``ts_col``'s type: naive
    timestamps diff against the naive epoch (tz-free, == DuckDB
    ``epoch_us``), instants use ``unix_micros``."""
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return lambda c: F.timestamp_diff("MICROSECOND", epoch, c)
    return F.unix_micros


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per key) to ``df``.

    A new session starts at a key's first event and at every event
    whose gap from the previous event strictly exceeds
    ``gap_minutes``.  ``tiebreak`` makes equal-timestamp ordering
    deterministic (required for a stable differential; pass a unique
    id column).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    micros = epoch_micros_fn(df, ts_col)
    gap_us = micros(F.col(ts_col)) - micros(F.lag(ts_col).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_summary(
    df: DataFrame, key: str, ts_col: str, gap_minutes: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): event count and exact integer
    duration in microseconds."""
    s = sessionize(df, key, ts_col, gap_minutes, tiebreak=tiebreak)
    micros = epoch_micros_fn(df, ts_col)
    return s.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (micros(F.max(ts_col)) - micros(F.min(ts_col))).alias("duration_us"),
    )
