"""Physical-plan audit: the checks a human would run with
``.explain('formatted')`` before shipping a job to a 1000-executor
cluster, as assertable predicates.

Used by tests to pin down scale properties that correctness tests
can't see: broadcast joins staying broadcast, exchanges not
multiplying, filters reaching the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_audit(df: DataFrame) -> dict[str, int]:
    """Counts of the plan features that matter at scale."""
    plan = explain_str(df, "formatted")
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_stages": plan.count("WholeStageCodegen"),
        "python_evals": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas"),
        "row_python_evals": plan.count("BatchEvalPython"),
        "pushed_filters": plan.count("PushedFilters: ["),
    }
