"""Plan inspection helpers (scale hygiene, SURVEY §4)."""

from dqmtools_spark.plans.audit import explain_str, plan_audit  # noqa: F401
