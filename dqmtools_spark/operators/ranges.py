"""Interval-point range join: match point events to the time
intervals containing them — WITHOUT a theta join.

Spark turns a raw ``s <= t AND t <= e`` join predicate into a
broadcast-nested-loop (quadratic, undistributable when neither side
fits in memory).  The scalable form BUCKETIZES time: every interval
is exploded into the fixed-width buckets it overlaps, points map to
their single bucket, and the join becomes an EQUI-join on
(key, bucket) followed by the exact range filter.  Cost is
O(intervals · avg_buckets_per_interval + points) shuffle rows and the
join never degenerates — the standard streaming/temporal-db trick
(bucket width tunes the explode factor vs candidate precision).

All bucket arithmetic is exact integer microseconds (same
``timestamp_diff``-from-naive-epoch discipline as
``operators/sessions.py``), so a DuckDB oracle can verify with the
plain range predicate — two deliberately different implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqmtools_spark.operators.sessions import epoch_micros_fn


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_minutes: int = 1440,
) -> DataFrame:
    """All (interval, point) pairs with the same ``key`` and
    ``start <= ts <= end`` (inclusive both ends).

    Returns every column of ``intervals`` plus every non-key column of
    ``points``.  Intervals with NULL bounds and points with NULL ts
    never match.  ``bucket_minutes`` trades explode factor (wide
    intervals span more buckets) against candidate precision; the
    default of one day suits hour-to-day-scale windows.

    Column-name preconditions (checked, ValueError): neither side may
    contain the internal ``_bkt`` column, and apart from ``key`` the
    two sides' column names must be disjoint (the output carries both
    sides' columns unqualified).
    """
    overlap = (set(intervals.columns) & set(points.columns)) - {key}
    if overlap:
        raise ValueError(
            f"intervals/points share non-key columns {sorted(overlap)}; "
            "rename before joining (output is unqualified)"
        )
    if "_bkt" in intervals.columns or "_bkt" in points.columns:
        raise ValueError("'_bkt' is reserved by interval_point_join")
    bucket_us = bucket_minutes * 60_000_000
    im = epoch_micros_fn(intervals, start_col)
    pm = epoch_micros_fn(points, ts_col)

    iv = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    buckets = F.sequence(
        F.floor(im(F.col(start_col)) / bucket_us).cast("long"),
        F.floor(im(F.col(end_col)) / bucket_us).cast("long"),
    )
    iv = iv.withColumn("_bkt", F.explode(buckets))

    pt = points.filter(F.col(ts_col).isNotNull()).withColumn(
        "_bkt", F.floor(pm(F.col(ts_col)) / bucket_us).cast("long")
    )
    pay = [c for c in points.columns if c != key]
    joined = iv.join(pt, [key, "_bkt"]).filter(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.select(*intervals.columns, *pay)
