"""WARC ingestion (Common Crawl's wire format) -> pages table.

The fixture writer emits spec-shaped WARC/1.0 records (one gzip
member per record, the CC layout); the reader must keep exactly the
``response`` records, strip the HTTP envelope byte-exactly, parse
WARC-Date to a tz-aware timestamp, and count-not-raise on corruption.
The last test runs the INGESTED table straight through the quality
pipeline — the full Common-Crawl-to-keep/drop flow.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from dqmtools_spark.sources.warc import (
    parse_warc_records,
    split_gzip_members,
    warc_gz_to_pages,
    write_warc_gz,
)

RECS = [
    {
        "uri": "https://a.example/x",
        "date": "2026-01-02T03:04:05Z",
        "body": b"<html><body>Hello quality world</body></html>",
    },
    {"uri": None, "type": "warcinfo", "body": b"software: fixture"},
    {
        "uri": "https://b.example/y",
        "date": "2026-02-03T04:05:06Z",
        "body": b"<html><body>Second page body</body></html>",
    },
    {"uri": "https://c.example/req", "type": "request", "body": b"GET / HTTP/1.1"},
]


@pytest.mark.parametrize("member_per_record", [True, False])
def test_responses_only_http_envelope_stripped(member_per_record):
    gz = write_warc_gz(RECS, member_per_record=member_per_record)
    rows, corrupt = warc_gz_to_pages(gz)
    assert corrupt == 0
    assert [r["url"] for r in rows] == ["https://a.example/x", "https://b.example/y"]
    assert rows[0]["html"] == RECS[0]["body"]  # byte-exact, no HTTP headers
    assert rows[0]["warc_ts"] == datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    assert rows[0]["text"] is None and rows[0]["lang"] is None


def test_gzip_member_splitting_is_per_record():
    gz = write_warc_gz(RECS, member_per_record=True)
    members = list(split_gzip_members(gz))
    assert len(members) == len(RECS)
    types = [next(parse_warc_records(m))["type"] for m in members]
    assert types == ["response", "warcinfo", "response", "request"]


def test_corruption_counts_not_raises():
    gz = write_warc_gz(RECS)
    rows, corrupt = warc_gz_to_pages(gz[: len(gz) // 2])  # truncated
    assert corrupt >= 1 and len(rows) >= 1  # prefix records survive
    import gzip as g

    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"Content-Length: 5\r\n\r\nnotht\r\n\r\n"
    )
    rows, corrupt = warc_gz_to_pages(g.compress(raw))  # non-HTTP payload
    assert rows == [] and corrupt == 1
    rows, corrupt = warc_gz_to_pages(b"\x1f\x8b\x00garbage")
    assert rows == [] and corrupt == 1


def test_read_warc_spark_end_to_end(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "seg-00000.warc.gz").write_bytes(write_warc_gz(RECS))
    (d / "seg-00001.warc.gz").write_bytes(
        write_warc_gz(
            [
                {
                    "uri": "https://d.example/z",
                    "date": "2026-03-04T05:06:07Z",
                    "body": b"<html><body>Third</body></html>",
                }
            ]
        )
    )
    (d / "notes.txt").write_bytes(b"ignored by pathGlobFilter")
    from dqmtools_spark.sources.warc import read_warc

    df = read_warc(spark, str(d), keep_stats=True)
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {
        "https://a.example/x",
        "https://b.example/y",
        "https://d.example/z",
    }
    assert rows["https://d.example/z"]["_corrupt_members"] == 0
    assert rows["https://d.example/z"]["_source_file"].endswith("seg-00001.warc.gz")
    assert bytes(rows["https://a.example/x"]["html"]) == RECS[0]["body"]


def test_warc_feeds_the_quality_pipeline(spark, tmp_path):
    """Ingested WARC pages run straight through run_pipeline — the
    full Common-Crawl-to-keep/drop flow over the north-rule schema."""
    d = tmp_path / "warcs"
    d.mkdir()
    body = (
        "<html><body>"
        + " ".join(f"plain english sentence number {i} with many common words" for i in range(30))
        + "</body></html>"
    ).encode()
    (d / "seg.warc.gz").write_bytes(
        write_warc_gz(
            [
                {"uri": "https://ok.example/long", "date": "2026-01-01T00:00:00Z", "body": body},
                {"uri": "https://tiny.example/short", "date": "2026-01-01T00:00:01Z", "body": b"<html>hi</html>"},
            ]
        )
    )
    from dqmtools_spark.pipeline import run_pipeline
    from dqmtools_spark.sources.warc import read_warc

    result, _ = run_pipeline(spark, read_warc(spark, str(d)), n_buckets=4)
    got = {r["url"]: r for r in result.collect()}
    assert got["https://tiny.example/short"]["keep"] is False  # too short
    assert "min_word_count" in got["https://tiny.example/short"]["reasons"]
