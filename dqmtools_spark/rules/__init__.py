"""Quality-rule registry, evaluation, and status-fold semantics
(rebuild of the reference's DQMTest/DQMTestSuite layer,
/root/reference/python/dqmtools/dqmtools.py:40-120)."""

from dqmtools_spark.rules.core import (  # noqa: F401
    QualityRule,
    RuleRegistry,
    evaluate_rules,
    fold_status,
    rule_level_results,
)
