"""Property-based checks (SURVEY §5.4): status-fold lattice laws and
prescale determinism.  Driver-side properties use hypothesis; the
Spark-side determinism check compares across different partitionings.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dqmtools_spark.rules.core import fold_status
from dqmtools_spark.schemas import BAD, INVALID, OK, WARNING

STATUS = st.sampled_from([INVALID, BAD, OK, WARNING])


@given(st.lists(STATUS, max_size=20))
def test_fold_order_invariant(statuses):
    assert fold_status(statuses) == fold_status(list(reversed(statuses)))
    assert fold_status(statuses) == fold_status(sorted(statuses))


@given(st.lists(STATUS, max_size=20), STATUS)
def test_fold_monotone_under_append(statuses, extra):
    """Adding a result can only keep or worsen the fold (lattice law:
    BAD dominates WARNING dominates OK, dqmtools.py:106-120)."""
    rank = {OK: 0, WARNING: 1, BAD: 2}
    before = fold_status(statuses)
    after = fold_status(statuses + [extra])
    assert rank[after] >= rank[before]


@given(st.lists(STATUS, min_size=1, max_size=20))
def test_fold_dominance(statuses):
    folded = fold_status(statuses)
    if any(s in (BAD, INVALID) for s in statuses):
        assert folded == BAD
    elif any(s == WARNING for s in statuses):
        assert folded == WARNING
    else:
        assert folded == OK


@settings(deadline=None, max_examples=10)
@given(st.integers(min_value=1, max_value=13))
def test_prescale_same_k_same_subset(spark, k):
    """P11 determinism: the kept subset is a pure function of (key, k),
    independent of partitioning — a re-run or a different cluster size
    samples the SAME units (unlike df.sample)."""
    from dqmtools_spark.operators.sampling import prescale

    base = spark.range(500).withColumnRenamed("id", "key")
    a = {r["key"] for r in prescale(base.repartition(2), "key", k).collect()}
    b = {r["key"] for r in prescale(base.repartition(7), "key", k).collect()}
    assert a == b
    assert 0 < len(a) < 500 or k == 1
