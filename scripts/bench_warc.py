"""WARC -> pipeline end-to-end throughput (VERDICT r4 item 7).

Generates a synthetic ``*.warc.gz`` segment set (spec-shaped records
wrapping the deterministic synth pages — the same fixture writer the
unit tests use, so the bytes are real Common-Crawl-layout one-member-
per-record gzip), then times the FULL first-contact path a Common
Crawl user takes: ``read_warc`` (binaryFile scan -> mapInPandas record
explode) -> quality pipeline -> aggregate.

Generation is distributed (``foreachPartition`` writes one .warc.gz
per partition — no driver loop), happens once per invocation, and is
NOT timed.  The timed region is write-free; ``os.sync`` runs before it
so generation writeback is not billed to ingest (see bench.py).

Usage:  python scripts/bench_warc.py [--docs 100000] [--files 64]
Prints one JSON line: docs/sec, MB/sec (compressed), per-rep seconds.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_warc_set(spark, out_dir: str, n_docs: int, n_files: int) -> float:
    """Synth pages -> n_files spec-shaped .warc.gz segments under
    out_dir (distributed, one file per partition).  Returns MB."""
    from dqmtools_spark.synth import synth_pages

    pages = synth_pages(spark, n_docs, seed=42).repartition(n_files)

    def write_part(rows) -> None:
        from pyspark import TaskContext

        from dqmtools_spark.sources.warc import write_warc_gz

        recs = [
            {
                "uri": r["url"],
                "date": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
                if r["warc_ts"]
                else None,
                "body": bytes(r["html"]) if r["html"] is not None else b"",
            }
            for r in rows
        ]
        if not recs:
            return
        pid = TaskContext.get().partitionId()
        with open(os.path.join(out_dir, f"seg-{pid:05d}.warc.gz"), "wb") as f:
            f.write(write_warc_gz(recs))

    pages.foreachPartition(write_part)
    return sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(out_dir, "*.warc.gz"))
    ) / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dqmtools_spark.pipeline import run_pipeline
    from dqmtools_spark.session import get_spark
    from dqmtools_spark.sources.warc import read_warc

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_warc", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_warc_")
    mb = generate_warc_set(spark, tmp, args.docs, args.files)

    from bench import _sync_fs  # the one flush-barrier implementation

    # warm codegen + Python workers on the same plan shape (uncounted)
    warm, _ = run_pipeline(spark, read_warc(spark, tmp))
    n = warm.agg(
        F.count(F.lit(1)).alias("n"), F.count_if(F.col("keep"))
    ).collect()[0]["n"]
    _sync_fs()

    def rep() -> float:
        t0 = time.perf_counter()
        result, _ = run_pipeline(spark, read_warc(spark, tmp))
        result.agg(
            F.count(F.lit(1)),
            F.count_if(F.col("keep")),
            F.sum(F.length("scrubbed_text")),
        ).collect()
        return round(time.perf_counter() - t0, 3)

    reps = [rep() for _ in range(args.reps)]
    best = min(reps)
    print(
        json.dumps(
            {
                "metric": "warc_pipeline_docs_per_sec",
                "value": round(n / best, 1),
                "docs": n,
                "files": args.files,
                "warc_mb": round(mb, 1),
                "mb_per_sec": round(mb / best, 1),
                "best_sec": best,
                "rep_sec": reps,
                "cpus": cpus,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
