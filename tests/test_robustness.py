"""Adversarial inputs through the full pipeline: the 100 TB rule is
that no single document may fail the job (reference R2 semantics,
dqmtools.py:60-68, lifted to per-doc null-safety)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dqmtools_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def adversarial(spark):
    big = ("word " * 200_000).encode()                  # ~1 MB doc
    rows = [
        ("u://null-html", None, None, None, None),
        ("u://empty", None, b"", None, None),
        ("u://invalid-utf8", None, b"\xff\xfe\x80 broken \xc3(", None, "en"),
        ("u://binary-junk", None, bytes(range(256)) * 4, None, None),
        ("u://huge", None, big, None, "en"),
        ("u://nested-script", None,
         b"<script>var x = '<script>';</script>visible the and of to in", None, "en"),
        ("u://only-tags", None, b"<div><p></p></div>", None, None),
        ("u://emoji", None, "caf\u00e9 \U0001f600 na\u00efve the and of".encode(), None, "en"),
        ("u://crlf", None, b"line one the and\r\nline two of to\r\n\r\n", None, "en"),
        ("u://cjk", None, "\u7684\u662f\u5728\u4e86 \u6211\u4eec \u4e2d\u6587".encode(), None, "zh"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    result, outcomes = run_pipeline(spark, df, n_buckets=4)
    return {r["url"]: r for r in result.collect()}, outcomes


def test_no_document_kills_the_job(adversarial):
    rows, outcomes = adversarial
    assert len(rows) == 10                      # every row made it through
    assert all(o.column is not None for o in outcomes)


def test_null_and_empty_fail_closed(adversarial):
    rows, _ = adversarial
    assert rows["u://null-html"]["keep"] is False
    assert rows["u://null-html"]["scrubbed_text"] is None
    assert rows["u://empty"]["keep"] is False


def test_degenerate_docs_are_dropped_not_errored(adversarial):
    rows, _ = adversarial
    for url in ("u://binary-junk", "u://only-tags", "u://invalid-utf8"):
        assert rows[url]["keep"] is False, url
        assert rows[url]["reasons"], url


def test_huge_doc_hits_max_word_count(adversarial):
    rows, _ = adversarial
    assert "max_word_count" in rows["u://huge"]["reasons"]


def test_unicode_survives_byte_identically(adversarial):
    rows, _ = adversarial
    assert "caf\u00e9" in rows["u://emoji"]["scrubbed_text"]
    assert "\U0001f600" in rows["u://emoji"]["scrubbed_text"]


def test_cjk_routes_to_zh_rules(adversarial):
    rows, _ = adversarial
    assert rows["u://cjk"]["lang_pred"] == "zh"


def test_determinism_across_runs(spark, adversarial):
    rows, _ = adversarial
    df = spark.createDataFrame(
        [("u://invalid-utf8", None, b"\xff\xfe\x80 broken \xc3(", None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    again, _ = run_pipeline(spark, df, n_buckets=4)
    r = again.first()
    assert r["scrubbed_text"] == rows["u://invalid-utf8"]["scrubbed_text"]
    assert r["reasons"] == rows["u://invalid-utf8"]["reasons"]
