"""Rule-registry semantics vs the reference (dqmtools.py:40-120)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dqmtools_spark.rules.core import (
    QualityRule,
    RuleRegistry,
    evaluate_rules,
    fold_status,
    rule_level_results,
)
from dqmtools_spark.schemas import BAD, INVALID, OK, WARNING


def test_duplicate_name_guard():
    """R3: dqmtools.py:78-84 raises on duplicate registration."""
    reg = RuleRegistry()
    reg.register(QualityRule("x", lambda df: F.lit(True)))
    with pytest.raises(ValueError):
        reg.register(QualityRule("x", lambda df: F.lit(True)))


def test_fold_lattice():
    """R5: dqmtools.py:106-120 — BAD dominates WARNING dominates OK."""
    assert fold_status([OK, OK]) == OK
    assert fold_status([OK, WARNING]) == WARNING
    assert fold_status([OK, WARNING, BAD]) == BAD
    assert fold_status([INVALID]) == BAD
    assert fold_status([]) == OK


def test_missing_input_is_warning_and_broken_rule_is_bad(spark):
    """R7 (wibeth_tests.py:16-17) + R2 (dqmtools.py:60-68)."""
    df = spark.createDataFrame([(1, 10), (2, 3)], ["id", "wc"])
    reg = RuleRegistry()
    reg.register(QualityRule("ok_rule", lambda d: d["wc"] >= 5, requires=("wc",)))
    reg.register(
        QualityRule("missing", lambda d: d["nope"] > 0, requires=("nope",))
    )

    def broken(d):
        raise RuntimeError("boom")

    reg.register(QualityRule("broken", broken))

    evaluated, outcomes = evaluate_rules(df, reg)
    by_name = {o.rule.name: o for o in outcomes}
    assert by_name["missing"].status == WARNING
    assert by_name["broken"].status == BAD
    assert by_name["ok_rule"].status == OK
    # only the applicable rule contributes to per-doc fold
    rows = {r["id"]: r for r in evaluated.collect()}
    assert rows[1]["keep"] is True and rows[2]["keep"] is False
    assert rows[2]["reasons"] == ["ok_rule"]

    results = rule_level_results(evaluated, outcomes)
    status = {r["name"]: r["status"] for r in results}
    assert status["ok_rule"] == BAD  # 1/2 docs failed -> dataset-level BAD
    assert status["missing"] == WARNING
    assert status["broken"] == BAD
    assert status["suite:ALL"] == BAD
    msg = {r["name"]: r["message"] for r in results}
    assert msg["ok_rule"] == "1/2 documents failed"


def test_null_stat_fails_closed(spark):
    """A null stat must count as FAIL (R2 per-doc form), not pass."""
    df = spark.createDataFrame([(1, None)], "id int, wc int")
    reg = RuleRegistry()
    reg.register(QualityRule("wc_min", lambda d: d["wc"] >= 5, requires=("wc",)))
    evaluated, _ = evaluate_rules(df, reg)
    row = evaluated.collect()[0]
    assert row["keep"] is False and row["reasons"] == ["wc_min"]


def test_latest_per_key_dedup(spark):
    """O2: dqmtools.py:96 sort desc + drop_duplicates(name)."""
    import datetime as dt

    from dqmtools_spark.operators.latest import latest_per_key

    rows = [
        ("a", 1, dt.datetime(2024, 1, 1)),
        ("a", 2, dt.datetime(2024, 1, 3)),
        ("a", 0, dt.datetime(2024, 1, 2)),
        ("b", 1, dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["name", "status", "last_update"])
    got = {
        r["name"]: r["status"]
        for r in latest_per_key(df, ["name"], "last_update").collect()
    }
    assert got == {"a": 2, "b": 1}


def test_new_gopher_c4_rules_fire(spark):
    from dqmtools_spark.pipeline import run_pipeline

    good_body = "the and of to in is that with for was are this have from not " * 5
    docs = [
        ("u://ellipsis", ("the quick brown fox is here today...\n" * 10) + good_body),
        ("u://bullets", ("- item one of the list\n" * 30) + "the and of\n"),
        ("u://curly", good_body + " function() { return 1; }"),
        ("u://clean", good_body),
    ]
    pages = spark.createDataFrame(
        [(u, None, t.encode(), None, "en") for u, t in docs],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    res, _ = run_pipeline(spark, pages)
    by = {r["url"]: r for r in res.collect()}
    assert "ellipsis_lines" in by["u://ellipsis"]["reasons"]
    assert "bullet_lines" in by["u://bullets"]["reasons"]
    assert "no_curly_braces" in by["u://curly"]["reasons"]
    assert by["u://clean"]["keep"] is True


def test_threshold_config_override(spark):
    from dqmtools_spark.pipeline import run_pipeline
    from dqmtools_spark.rules.builtin import default_registry

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown threshold keys"):
        default_registry({"min_wrd_count": 1})

    body = "the and of to in is that with for was are this have from not " * 2
    pages = spark.createDataFrame(
        [("u://d", None, body.encode(), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    base, _ = run_pipeline(spark, pages)
    strict, _ = run_pipeline(
        spark, pages, registry=default_registry({"min_word_count": 500})
    )
    assert base.first()["keep"] is True
    r = strict.first()
    assert r["keep"] is False and "min_word_count" in r["reasons"]
