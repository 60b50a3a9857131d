"""Result reporting: parameterized rule builders, offender diagnostics,
and the append-only results history with latest-per-name view.

Reference semantics (file:line into /root/reference):

- R10 comparison-operator param: ``CheckRMS`` takes ``operator.gt`` /
  ``operator.lt`` for its high/low variants
  (``python/dqmtools/dqmtests/wibeth_tests.py:215,231,242``;
  configured at ``scripts/dqm_analyzer.py:68-71``) →
  :func:`threshold_rule` builds a QualityRule from (stat, op, value).
- R11 verbose offender dump: on failure the reference joins detail rows
  back and prints the offending table
  (``common_tests.py:48-62``, ``wibeth_tests.py:199-208``) →
  :func:`offenders` returns the failing documents as a DataFrame.
- result model (``dqmtools.py:75,96,99-104``): results are appended
  rows ``{name, result, message, last_update}`` with latest-per-name
  dedup ``sort_values('last_update').drop_duplicates(['name'])`` →
  :class:`ResultsHistory` appends to a table; ``latest()`` is the O2
  window dedup.
- S10 ASCII table sink (``dqmtools.py:157-171``, tabulate) →
  :func:`ascii_table` renders the (small, post-aggregation) results.
"""

from __future__ import annotations

import datetime as dt
import operator as _op
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dqmtools_spark.operators.latest import latest_per_key
from dqmtools_spark.rules.core import QualityRule
from dqmtools_spark.schemas import BAD, INVALID, OK, WARNING

# ------------------------------------------------------------------ R10

_OPS: dict[str, Callable[[Column, object], Column]] = {
    ">": _op.gt,
    ">=": _op.ge,
    "<": _op.lt,
    "<=": _op.le,
    "==": _op.eq,
    "!=": _op.ne,
}


def threshold_rule(
    name: str,
    stat: str,
    op: str | Callable[[Column, object], Column],
    value,
    group: str = "default",
) -> QualityRule:
    """Rule from (stat column, comparison operator, threshold).

    ``op`` is a symbol string or any callable ``(Column, value) ->
    Column`` — python's ``operator.gt``/``lt`` work directly, matching
    the reference's parameterization.
    """
    fn = _OPS[op] if isinstance(op, str) else op
    return QualityRule(
        name=name,
        builder=lambda df, s=stat, v=value: fn(df[s], v),
        group=group,
        requires=(stat,),
    )


def rule_family(
    spec: dict[str, tuple[str, str, object]], group: str = "default"
) -> list[QualityRule]:
    """R8 rule-family generator: ``{name: (stat, op, value)}`` — the
    config-table form of the reference's 11 stamped subclasses
    (wibeth_tests.py:54-156)."""
    return [
        threshold_rule(name, stat, op, value, group)
        for name, (stat, op, value) in spec.items()
    ]


# ------------------------------------------------------------------ R11


def offenders(
    evaluated: DataFrame,
    rule_name: str,
    detail_cols: list[str] | None = None,
    prefix: str = "pass_",
    limit: int | None = 100,
) -> DataFrame:
    """Documents failing ``rule_name`` with their diagnostic columns —
    the reference's verbose failure dump as a lazy DataFrame (bounded
    by default: at 10^12 docs an unlimited offender dump is an outage).
    """
    out = evaluated.filter(~F.col(f"{prefix}{rule_name}"))
    if detail_cols:
        out = out.select(*detail_cols)
    return out.limit(limit) if limit is not None else out


# ------------------------------------------------- results history + O2

_STATUS_LABEL = {INVALID: "INVALID", BAD: "BAD", OK: "OK", WARNING: "WARNING"}

RESULT_COLS = ["name", "status", "message", "last_update"]


class ResultsHistory:
    """Append-only run-result history with a latest-per-name view.

    Backed by a parquet dir when ``path`` is given, else an in-session
    union (the reference keeps history in memory, dqmtools.py:99-104).
    """

    def __init__(self, spark: SparkSession, path: str | None = None):
        self.spark = spark
        self.path = path
        self._mem: DataFrame | None = None

    def append(self, rows: list[dict], now: dt.datetime | None = None) -> None:
        now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        rows = [{**r, "last_update": r.get("last_update", now)} for r in rows]
        df = self.spark.createDataFrame(
            rows, "name string, status int, message string, last_update timestamp"
        )
        if self.path:
            df.write.mode("append").parquet(self.path)
        else:
            self._mem = df if self._mem is None else self._mem.unionByName(df)

    def all(self) -> DataFrame:
        if self.path:
            return self.spark.read.parquet(self.path)
        if self._mem is None:
            return self.spark.createDataFrame(
                [], "name string, status int, message string, last_update timestamp"
            )
        return self._mem

    def latest(self) -> DataFrame:
        """O2: one row per rule name, newest last_update wins."""
        return latest_per_key(self.all(), ["name"], "last_update").orderBy("name")

    def clear_old(self, keep_latest: bool = True) -> DataFrame:
        """Reference's clear_old_results (dqmtools.py:154-155)."""
        return self.latest() if keep_latest else self.all().limit(0)


def ascii_table(results: DataFrame, show_last_update: bool = True) -> str:
    """Render a (small) results DataFrame as an aligned ASCII table —
    the reference's tabulate sink (dqmtools.py:157-171).  Collects;
    callers pass post-aggregation frames only."""
    rows = results.collect()
    headers = ["name", "status", "message"] + (
        ["last_update"] if show_last_update else []
    )
    table = []
    for r in rows:
        rec = [
            str(r["name"]),
            _STATUS_LABEL.get(r["status"], str(r["status"])),
            str(r["message"]),
        ]
        if show_last_update:
            rec.append(str(r["last_update"]))
        table.append(rec)
    widths = [
        max(len(h), *(len(row[i]) for row in table)) if table else len(h)
        for i, h in enumerate(headers)
    ]
    sep = "-+-".join("-" * w for w in widths)
    lines = [" | ".join(h.ljust(w) for h, w in zip(headers, widths)), sep]
    for row in table:
        lines.append(" | ".join(c.ljust(w) for c, w in zip(row, widths)))
    return "\n".join(lines)
