"""As-of (nearest-earlier) join — the time-series primitive Spark lacks.

``asof_join`` attaches, to each left row, the right row with the
greatest ``right_ts <= left_ts`` within the same key (backward as-of,
inclusive), left-outer: left rows with no earlier right row keep NULLs.
This is the "latest reading at or before the probe time" lookup the
reference's latest-view display answers for one key interactively
(``/root/reference/python/dqmtools/dqm_display.py`` latest-per-name);
the join form answers it for every probe row in one pass.

Physical strategy — union + ordered window, NOT a range join:

  tag left (side=1) and right (side=0) rows, union them with the right
  payload packed into ONE struct column (typed-null on left rows), then
  ``last(_payload, ignorenulls) OVER (PARTITION BY key ORDER BY ts,
  side, tiebreak ROWS UNBOUNDED PRECEDING..CURRENT)`` and keep side=1.

At 100 TB this is exactly one hash exchange on the key plus a
per-partition sort — the same cost as the groupBy the data needs
anyway.  The naive alternatives both die at scale: an inequality
theta-join degenerates to broadcast-nested-loop, and "join then filter
max-ts" explodes |left| x |right| per key first.  Equal timestamps:
right rows sort BEFORE left rows (side 0 < 1) so an equal-ts right row
IS visible (inclusive, matching DuckDB ``ASOF JOIN ... ON l.ts >=
r.ts`` which is the differential oracle).  The right side must be
unique per (key, ts) — with duplicates "the" as-of match is
ill-defined (DuckDB picks an arbitrary one); dedup upstream.  Packing
the payload in one struct keeps all attached columns coherent (all
from the same matched row) even when individual fields are NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: every ``left`` row + the latest ``right``
    row (same ``on`` key, ``right_ts <= left_ts``), or NULLs.

    Returns all ``left`` columns plus each ``right`` column (the key
    column excluded) renamed ``{payload_prefix}{name}``.  ``right``
    must be unique per (on, right_ts) — see module docstring.

    NULL timestamps: a NULL ``right_ts`` row can never satisfy
    ``right_ts <= left_ts`` and is dropped from the match side; a NULL
    ``left_ts`` row is kept but matches nothing (it sorts before every
    real timestamp, where no right row precedes it).  Both agree with
    DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (NULL comparison ->
    no match) and pandas ``merge_asof``.
    """
    left_cols = left.columns
    pay_cols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in pay_cols])
    payload_type = right.select(payload.alias("_p")).schema["_p"].dataType

    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(payload_type).alias("_p"),
    )
    l_struct_type = l_side.schema["_l"].dataType
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_type).alias("_l"),
        payload.alias("_p"),
    )

    w = (
        Window.partitionBy("_k")
        # nulls-first pins NULL-left_ts rows at the partition head,
        # where no (non-null, filtered-above) right row precedes them;
        # third key makes equal-(ts, side) right rows deterministic if a
        # caller ignores the uniqueness contract: highest payload wins
        .orderBy(
            F.col("_ts").asc_nulls_first(),
            F.col("_side").asc(),
            F.col("_p").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = [F.col(f"_l.{c}").alias(c) for c in left_cols]
    out += [F.col(f"_m.{c}").alias(f"{payload_prefix}{c}") for c in pay_cols]
    return matched.select(*out)
