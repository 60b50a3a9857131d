"""Round-5 operator tests: maximal-span ExactSubstr removal (the
Lee et al. 2022 minimum-span-length rule — scattered short n-grams do
not count as duplication, long boilerplate runs do)."""

from __future__ import annotations

from dqmtools_spark.operators.dedup import remove_duplicated_spans
from dqmtools_spark.plans.audit import explain_str

# 9 words, 58 chars of tokens + 8 gaps = 66 rejoined chars
BOILER = "every page shares this long boilerplate navigation footer sentence"
# 5 words, 10 + 4 = 14 rejoined chars — one hot 5-gram, under any
# realistic minimum span length
SHORT = "aa bb cc dd ee"


def _rows():
    return [
        (0, f"{SHORT} unique0 one two three {BOILER} tail0 xx yy"),
        (1, f"intro1 word {SHORT} middle1 {BOILER} closing1 zz"),
        (2, "totally unrelated content with nothing shared at all here"),
    ]


def test_maximal_span_rule_distinguishes_boilerplate_from_stray_grams(spark):
    """min_span_chars=50: the 66-char boilerplate run is removed, the
    14-char stray shared 5-gram survives — the distinction the fixed-n
    coverage rule (min_span_chars=0) cannot make."""
    df = spark.createDataFrame(_rows(), ["doc_id", "text"])
    out = remove_duplicated_spans(
        df, "text", "doc_id", n=5, min_docs=2, min_span_chars=50, eager=True
    )
    got = {r["doc_id"]: r for r in out.collect()}
    out.unpersist()
    for d in (0, 1):
        toks = got[d]["clean_text"].split()
        assert "boilerplate" not in toks, "long run must be removed"
        for w in SHORT.split():
            assert w in toks, "short stray gram must SURVIVE the max rule"
        assert got[d]["n_removed"] == len(BOILER.split())
    assert got[0]["clean_text"] == (
        f"{SHORT} unique0 one two three tail0 xx yy"
    )
    # untouched doc passes through token-rejoined
    assert got[2]["n_removed"] == 0 and got[2]["clean_text"] == _rows()[2][1]

    # the fixed-n rule (default) removes BOTH spans — 5 more tokens
    plain = remove_duplicated_spans(
        df, "text", "doc_id", n=5, min_docs=2, eager=True
    )
    pg = {r["doc_id"]: r for r in plain.collect()}
    plain.unpersist()
    for d in (0, 1):
        assert pg[d]["n_removed"] == len(BOILER.split()) + len(SHORT.split())


def test_maximal_span_char_threshold_is_exact(spark):
    """The span char length is token lengths + single-space gaps and
    the threshold is inclusive: a 14-char span is removed at
    min_span_chars=14 and kept at 15 — bit-exact integer arithmetic,
    the same the DuckDB oracle computes."""
    rows = [
        (0, f"{SHORT} unique0 filler0 morefiller0"),
        (1, f"{SHORT} unique1 filler1 morefiller1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    at14 = remove_duplicated_spans(
        df, "text", "doc_id", n=5, min_docs=2, min_span_chars=14,
        persist_covered=False, persist_grams=False,
    )
    at15 = remove_duplicated_spans(
        df, "text", "doc_id", n=5, min_docs=2, min_span_chars=15,
        persist_covered=False, persist_grams=False,
    )
    g14 = {r["doc_id"]: r["n_removed"] for r in at14.collect()}
    g15 = {r["doc_id"]: r["n_removed"] for r in at15.collect()}
    assert g14 == {0: 5, 1: 5}
    assert g15 == {0: 0, 1: 0}


def test_maximal_span_merges_overlapping_grams_into_one_island(spark):
    """Adjacent/overlapping hot-gram positions form ONE maximal span:
    each individual 5-gram of the boilerplate is well under the
    threshold, only their merged run crosses it — so removal proves
    the islands actually merged."""
    rows = [
        (0, f"pre0 alpha {BOILER} omega post0"),
        (1, f"{BOILER} pre1 something else entirely here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # every single 5-gram of BOILER rejoins to < 50 chars; the merged
    # 9-token island is 66 chars
    out = remove_duplicated_spans(
        df, "text", "doc_id", n=5, min_docs=2, min_span_chars=50, eager=True
    )
    got = {r["doc_id"]: r["n_removed"] for r in out.collect()}
    out.unpersist()
    assert got == {0: 9, 1: 9}
    plan = explain_str(
        remove_duplicated_spans(
            df, "text", "doc_id", n=5, min_docs=2, min_span_chars=50,
            persist_covered=False, persist_grams=False,
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
