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


def test_duplicated_ngram_spans_planted(spark):
    """Planted repeated span: docs 0 and 1 share one exact 6-word
    sentence inside otherwise-unique text; with n=5 the shared
    sentence contributes exactly 2 in-sentence gram positions per doc,
    and no unique-text gram may be flagged."""
    from dqmtools_spark.operators.dedup import duplicated_ngram_spans

    shared = "the exact same boilerplate sentence here"
    rows = [
        (0, f"alpha beta gamma delta {shared} unique tail zero aa bb"),
        (1, f"one two three four five {shared} other ending words xx"),
        (2, "completely different text with no overlap at all in it"),
        (3, "short"),  # < n words: no grams, no row
        (4, None),     # null text: no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in duplicated_ngram_spans(df, "text", "doc_id", n=5).collect()
    }
    assert set(got) == {0, 1, 2}
    # 6-word shared span -> 6 - 5 + 1 = 2 fully-contained 5-gram positions
    assert got[0]["n_dup_grams"] == 2 and got[1]["n_dup_grams"] == 2
    assert got[2]["n_dup_grams"] == 0 and got[2]["dup_fraction"] == 0.0
    for d in (0, 1):
        n_words = len(rows[d][1].split())
        assert got[d]["n_grams"] == n_words - 4
        assert abs(got[d]["dup_fraction"] - 2 / (n_words - 4)) < 1e-6


def test_remove_duplicated_spans_planted(spark):
    """Removal drops exactly the tokens covered by hot grams: the
    shared 6-word sentence disappears from both carriers, unique docs
    and short docs pass through token-rejoined, and a doc that IS the
    hot span comes back empty."""
    from dqmtools_spark.operators.dedup import remove_duplicated_spans

    shared = "the exact same boilerplate sentence here"
    rows = [
        (0, f"alpha beta gamma delta {shared} unique tail zero aa bb"),
        (1, f"one two three four five {shared} other ending words xx"),
        (2, "completely different text with no overlap at all in it"),
        (3, "short"),
        (4, None),
        (5, shared),  # the whole doc IS the hot span -> fully removed
        (6, shared),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_duplicated_spans(df, "text", "doc_id", n=5, min_docs=2, eager=True)
    got = {r["doc_id"]: r for r in out.collect()}
    out.unpersist()
    assert set(got) == {0, 1, 2, 3, 5, 6}  # null text emits no row
    # hot grams are ONLY the two fully-in-sentence 5-grams (straddling
    # grams mix in each doc's unique context), so covered positions =
    # union of the two gram spans = exactly the 6 shared tokens
    for d in (0, 1):
        assert got[d]["n_removed"] == 6
        assert shared.split()[0] not in got[d]["clean_text"].split()
    assert got[0]["clean_text"] == "alpha beta gamma delta unique tail zero aa bb"
    assert got[1]["clean_text"] == "one two three four five other ending words xx"
    # untouched docs: token-rejoined original, zero removals
    assert got[2]["n_removed"] == 0 and got[2]["clean_text"] == rows[2][1]
    assert got[3]["n_removed"] == 0 and got[3]["clean_text"] == "short"
    # fully-duplicated doc -> empty rebuild, fraction 1.0
    for d in (5, 6):
        assert got[d]["clean_text"] == "" and got[d]["removed_fraction"] == 1.0


def test_remove_duplicated_spans_plan(spark):
    """No cartesian anywhere; the token explode+rebuild is gated on the
    dup-doc semi-join so clean docs never shuffle their tokens."""
    from dqmtools_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e g")], ["doc_id", "text"]
    )
    out = remove_duplicated_spans(df, "text", "doc_id", n=5, persist_covered=False)
    plan = explain_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {r["doc_id"]: r for r in out.collect()}
    # shared hot gram "a b c d e" covers positions 0..4 in both docs
    assert got[0]["clean_text"] == "f" and got[1]["clean_text"] == "g"
    assert got[0]["n_removed"] == 5


def test_duplicated_ngram_spans_multiplicity_and_plan(spark):
    """A doc repeating its own gram twice counts both POSITIONS once
    the gram is corpus-hot; the plan stays equi-join (no cartesian)."""
    from dqmtools_spark.operators.dedup import duplicated_ngram_spans

    s = "a b c d e"
    rows = [(0, f"{s} x {s}"), (1, s)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_ngram_spans(df, "text", "doc_id", n=5)
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 0 has 7 gram positions, of which position 1 ("a b c d e")
    # and position 7 (same gram again) are hot via doc 1
    assert got[0]["n_grams"] == 7 and got[0]["n_dup_grams"] == 2
    assert got[1]["n_grams"] == 1 and got[1]["n_dup_grams"] == 1
    plan = explain_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
