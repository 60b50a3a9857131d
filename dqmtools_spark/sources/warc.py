"""WARC ingestion — the format Common Crawl actually ships.

Turns ``*.warc.gz`` files (one gzip MEMBER per record, the CC
convention — also tolerates a single-member stream) into the
north-rule pages table (``schemas.PAGES_SCHEMA``: url, warc_ts, html,
text, lang), keeping only ``WARC-Type: response`` records and
stripping the HTTP envelope so ``html`` is the raw payload the
pipeline's extract step expects.  ``text``/``lang`` are NULL at
ingest — they are pipeline OUTPUTS.

Spark shape: ``spark.read.format("binaryFile")`` (one task per WARC
file — Common Crawl segments are ~1 GiB, already the right task
granule; 90k files = 90k tasks) -> ``mapInPandas`` exploding each
file's records, Arrow-batched, shuffle-free.  Malformed members and
records are COUNTED AND SKIPPED, not raised: at 100 TB a corrupt
member must cost one counter bump, not a stage retry
(``_corrupt_members`` column when ``keep_stats=True``).

Pure-Python parsing (zlib multi-member decompression, WARC/1.0 header
block, HTTP response split) — no external WARC library exists in this
container; the fixture writer emits spec-shaped records for tests.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


# decompression-bomb guard for untrusted crawls: one WARC record
# (one gzip member) above this expanded size is rejected as corrupt
# (a real CC response record is <= a few MB; a crafted member can
# claim ~1000x expansion and exhaust executor memory BEFORE the
# MemoryError guard could catch anything)
MAX_MEMBER_BYTES = 1 << 30  # 1 GiB


def split_gzip_members(
    data: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time (the WARC.gz layout: one record per member).  A member whose
    EXPANDED size exceeds ``max_member_bytes`` raises ValueError with
    the decompression abandoned mid-stream — bounded memory on
    crafted input."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        parts, total = [], 0
        buf = data[pos:]
        while True:
            out = d.decompress(buf, 1 << 20)  # 1 MiB output chunks
            parts.append(out)
            total += len(out)
            if total > max_member_bytes:
                raise ValueError(
                    f"gzip member exceeds {max_member_bytes} bytes expanded"
                )
            if d.eof:
                break
            nxt = d.unconsumed_tail
            if not out and len(nxt) >= len(buf):
                # no output and no input consumed: the stream is stuck
                raise ValueError("truncated gzip member")
            buf = nxt
        yield b"".join(parts)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def parse_warc_records(raw: bytes) -> Iterator[dict]:
    """Parse WARC/1.0-1.1 records out of an UNCOMPRESSED byte stream
    (one or many records).  Yields
    {type, uri, date, content_type, payload} — ``payload`` is the
    record content block, HTTP envelope included."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n"):
            pos += 2 if raw[pos : pos + 2] == b"\r\n" else 1
        if pos >= n:
            return
        if not raw[pos:].startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at {pos}")
        hdr_end = raw.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = raw.find(b"\n\n", pos)
            sep = 2
        if hdr_end == -1:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].decode("utf-8", "replace").splitlines()
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/bad Content-Length") from e
        body_start = hdr_end + sep
        if body_start + length > n:
            raise ValueError("WARC content block truncated")
        yield {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "content_type": headers.get("content-type", ""),
            "payload": raw[body_start : body_start + length],
        }
        pos = body_start + length


def split_http_response(payload: bytes) -> tuple[dict[str, str], bytes]:
    """HTTP response bytes -> (headers, body).  Raises ValueError when
    the payload is not an HTTP response."""
    if not payload.startswith(b"HTTP/"):
        raise ValueError("payload is not an HTTP response")
    hdr_end = payload.find(b"\r\n\r\n")
    sep = 4
    if hdr_end == -1:
        hdr_end = payload.find(b"\n\n")
        sep = 2
    if hdr_end == -1:
        raise ValueError("unterminated HTTP header block")
    headers: dict[str, str] = {}
    for line in payload[:hdr_end].decode("latin-1").splitlines()[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers, payload[hdr_end + sep :]


def _parse_warc_date(s: str | None) -> datetime | None:
    if not s:
        return None
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def warc_gz_to_pages(data: bytes) -> tuple[list[dict], int]:
    """One .warc.gz file's bytes -> (page rows, corrupt member count).
    Rows carry url/warc_ts/html; text/lang are None (pipeline
    outputs)."""
    rows: list[dict] = []
    corrupt = 0
    pos_iter = split_gzip_members(data)
    while True:
        try:
            member = next(pos_iter)
        except StopIteration:
            break
        except (ValueError, zlib.error, MemoryError):
            corrupt += 1
            break  # stream position is unrecoverable past a bad member
        try:
            for rec in parse_warc_records(member):
                if rec["type"] != "response" or not rec["uri"]:
                    continue
                try:
                    _http, body = split_http_response(rec["payload"])
                except ValueError:
                    corrupt += 1
                    continue
                rows.append(
                    {
                        "url": rec["uri"],
                        "warc_ts": _parse_warc_date(rec["date"]),
                        "html": body,
                        "text": None,
                        "lang": None,
                    }
                )
        except ValueError:
            corrupt += 1
    return rows, corrupt


def read_warc(
    spark: SparkSession, path: str, keep_stats: bool = False
) -> DataFrame:
    """``*.warc.gz`` files under ``path`` -> pages DataFrame
    (PAGES_SCHEMA; + ``_source_file``/``_corrupt_members`` when
    ``keep_stats``).  One Arrow task per file; no shuffle."""
    from pyspark.sql import types as T

    from dqmtools_spark.schemas import PAGES_SCHEMA

    fields = list(PAGES_SCHEMA.fields)
    if keep_stats:
        fields = fields + [
            T.StructField("_source_file", T.StringType(), True),
            T.StructField("_corrupt_members", T.IntegerType(), True),
        ]
    schema = T.StructType(fields)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            for _, file_row in pdf.iterrows():
                rows, corrupt = warc_gz_to_pages(bytes(file_row["content"]))
                if keep_stats:
                    for r in rows:
                        r["_source_file"] = file_row["path"]
                        r["_corrupt_members"] = corrupt
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
        .mapInPandas(explode, schema=schema)
    )


# ------------------------------------------------------------ fixture


def write_warc_gz(records: list[dict], member_per_record: bool = True) -> bytes:
    """Fixture writer: [{uri, date, body, status?, type?}] ->
    spec-shaped .warc.gz bytes (one gzip member per record by default,
    the Common Crawl layout; one big member otherwise)."""
    raws = []
    for rec in records:
        body = rec["body"]
        status = rec.get("status", 200)
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        rtype = rec.get("type", "response")
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            + (f"WARC-Target-URI: {rec['uri']}\r\n" if rec.get("uri") else "")
            + (f"WARC-Date: {rec['date']}\r\n" if rec.get("date") else "")
            + "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        raws.append(hdr + http + b"\r\n\r\n")
    if member_per_record:
        out = io.BytesIO()
        for raw in raws:
            out.write(gzip.compress(raw))
        return out.getvalue()
    return gzip.compress(b"".join(raws))
