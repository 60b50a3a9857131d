"""Round-4 hardening tests: fuzzy hot-block guard, global-line-dedup
skew behaviour, streaming session restart (the latter two live in
their own modules; this file covers the fuzzy guard).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dqmtools_spark.operators.fuzzy import blocked_levenshtein_pairs
from dqmtools_spark.plans.audit import explain_str


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["dist"]) for r in df.collect())


def test_fuzzy_hot_block_guard_salt_splits_without_recall_loss(spark):
    """Planted degenerate block: every title starts with "the" (the
    straggler scenario from VERDICT r3 #2).  With max_block below the
    block size the operator salt-splits on length buckets of width
    max_dist+1; results must be IDENTICAL to the unguarded run
    (edit distance >= |len difference|, so neighbour-bucket
    replication preserves recall exactly), including a planted pair
    that straddles a bucket boundary."""
    rows = []
    # cluster A: 60 near-identical short titles (len 23, bucket 5)
    for i in range(60):
        rows.append((i, "the quick brown fox %03d" % i))
    # cluster B: 60 long titles (len ~240, far bucket) — cross-cluster
    # pairs exceed max_dist and must be skipped cheaply
    for i in range(60, 120):
        rows.append((i, "the " + "lorem ipsum dolor sit amet " * 8 + "%03d" % i))
    # bucket-boundary pair: len 23 (bucket 5) vs len 24 (bucket 6),
    # dist 1 — only the ±1 replication can find it
    rows.append((300, "the quick brown fox xyz"))
    rows.append((301, "the quick brown fox xyzw"))
    # a small block that must stay un-split
    rows.append((400, "beta one"))
    rows.append((401, "beta one!"))
    df = spark.createDataFrame(rows, ["id", "title"]).repartition(8)

    kw = dict(
        key=F.col("title"),
        block=F.split(F.col("title"), " ").getItem(0),
        id_col="id",
        max_dist=3,
    )
    guarded = blocked_levenshtein_pairs(df, **kw, max_block=50)
    unguarded = blocked_levenshtein_pairs(df, **kw, max_block=None)

    g, u = _pairs(guarded), _pairs(unguarded)
    assert g == u
    assert (300, 301, 1) in g, "bucket-boundary pair lost by the split"
    assert (400, 401, 1) in g, "small block must be unaffected"
    assert len(g) > 1000  # cluster A is all-pairs within max_dist

    plan = explain_str(guarded)
    # the split key participates in the candidate equi-join…
    assert "_bkt" in plan, "length-bucket key absent from the plan"
    # …and the join is still an equi-join, never cartesian/theta
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_fuzzy_guard_noop_when_no_hot_blocks(spark):
    """Guard active but no block exceeds the cap: results match the
    unguarded operator bit-for-bit (the q_fuzzy_prefix_pairs oracle
    relies on this)."""
    rows = [
        (1, "alpha the quick brown fox"),
        (2, "alpha the quick brwon fox"),
        (3, "alpha a completely different thing"),
        (4, "beta the quick brown fox"),
    ]
    df = spark.createDataFrame(rows, ["id", "title"])
    kw = dict(
        key=F.col("title"),
        block=F.split(F.col("title"), " ").getItem(0),
        id_col="id",
        max_dist=3,
    )
    assert _pairs(
        blocked_levenshtein_pairs(df, **kw, max_block=1000)
    ) == _pairs(blocked_levenshtein_pairs(df, **kw, max_block=None)) == [
        (1, 2, 2)
    ]
