"""Deterministic synthetic ``pages`` generator (BASELINE input_hint shape).

Content is a pure function of ``(seed, doc_id)`` — NOT of partitioning —
so the same table materializes identically at any parallelism (the
N-vs-4N scaling runs must see identical input) and golden labels can be
committed.  Generation itself is distributed: ``spark.range(n)`` →
``mapInPandas`` (no driver-side loop; a 10^12-row table would be built
the same way).

Row features exercised (FIXTURES.md §1):
- skewed domains: one domain carries ~30% of rows (salting/AQE target);
- multi-language bodies drawn from marker-word lists (langid signal);
- embedded PII (emails, phones, SSNs, IPs) and toxic tokens;
- boilerplate repeated lines, low-quality docs (too short / symbol soup).
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator

import pandas as pd

from dqmtools_spark.functions.textproc import LANG_MARKERS, _CONTENT_WORDS, extract_text

LANGS = ["en", "fr", "es", "de", "zh"]
_LANG_WEIGHTS = [40, 15, 15, 15, 15]

_ZH_CHARS = "的是在了我有和就不人都一这上们到时大地为子中你说"

_BOILERPLATE = "All rights reserved. Cookie policy applies."
_EPOCH = dt.datetime(2024, 1, 1)

_PII_SNIPPETS = [
    "contact us at {u}@example.com for details",
    "call (555) 201-{n:04d} during business hours",
    "ref 123-45-{n:04d} on file",
    "served from 10.1.2.{o}",
    "this is frakking great content",
]


def _words_for(lang: str, rng: random.Random, n: int) -> list[str]:
    if lang == "zh":
        return ["".join(rng.choice(_ZH_CHARS) for _ in range(rng.randint(2, 6))) for _ in range(n)]
    markers = sorted(LANG_MARKERS[lang])
    pool = markers + _CONTENT_WORDS
    out = []
    for _ in range(n):
        # ~45% marker words keeps langid signal strong and deterministic
        out.append(rng.choice(markers) if rng.random() < 0.45 else rng.choice(pool))
    return out


def gen_page(seed: int, doc_id: int) -> dict:
    """Pure function (seed, doc_id) -> one pages row."""
    rng = random.Random(seed * 1_000_003 + doc_id)
    lang = rng.choices(LANGS, weights=_LANG_WEIGHTS, k=1)[0]

    # Zipf-ish domain skew: 30% of rows on one hot domain.
    if rng.random() < 0.30:
        domain = "big.example.com"
    else:
        domain = f"site{rng.randrange(200)}.example.org"
    url = f"https://{domain}/page/{doc_id}"
    warc_ts = _EPOCH + dt.timedelta(seconds=rng.randrange(90 * 24 * 3600))

    quality_roll = rng.random()
    paragraphs: list[str] = []
    if quality_roll < 0.08:  # too-short doc
        n_sent = 1
        sent_len = (3, 8)
    elif quality_roll < 0.14:  # symbol soup
        n_sent = rng.randint(3, 6)
        sent_len = (8, 20)
    else:  # normal doc
        n_sent = rng.randint(4, 18)
        sent_len = (12, 40)

    for _ in range(n_sent):
        words = _words_for(lang, rng, rng.randint(*sent_len))
        sent = " ".join(words)
        if quality_roll < 0.14 and quality_roll >= 0.08:
            sent = sent + " " + "#$%@!" * rng.randint(3, 10)
        paragraphs.append(sent)

    # PII / toxicity injection (~25% of docs)
    if rng.random() < 0.25:
        snip = rng.choice(_PII_SNIPPETS).format(
            u=f"user{rng.randrange(1000)}", n=rng.randrange(10000), o=rng.randrange(256)
        )
        paragraphs.insert(rng.randrange(len(paragraphs) + 1), snip)

    # boilerplate repeated lines (~35% of docs get 2-5 copies)
    if rng.random() < 0.35:
        for _ in range(rng.randint(2, 5)):
            paragraphs.insert(rng.randrange(len(paragraphs) + 1), _BOILERPLATE)

    body = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        f"<html><head><title>doc {doc_id}</title>"
        f"<style>body {{color: red}}</style></head>\n"
        f"<body><script>var x = 1 &lt; 2;</script>\n{body}\n"
        f"<div>&copy; footer &amp; nav</div></body></html>"
    ).encode("utf-8")

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": extract_text(html),  # reference extraction — the invariant
        "lang": lang,
    }


def gen_pages_pdf(seed: int, ids: list[int]) -> pd.DataFrame:
    """pandas frame of pages rows for the given doc ids (test-side)."""
    rows = [gen_page(seed, i) for i in ids]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_pages(spark, n_rows: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic pages DataFrame (Spark-side)."""
    from dqmtools_spark.schemas import PAGES_SCHEMA

    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_pages_pdf(seed, pdf["id"].tolist())

    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
