"""Benchmark harness — one JSON line on stdout (driver contract).

Headline workloads:
- ``pipeline``: the north-rule quality pipeline (extract → langid →
  stats → rules → perplexity → scrub → fold) over a deterministic
  synthetic pages table sized to the scale factor.
- relational/dedup/similarity queries from ``__spark_entry__`` at
  ``$SPARK_GRAFT_SF_DIR``.

``--scaling`` additionally runs the pipeline at local[8] and local[32]
on identical input and reports throughput + efficiency (the sandbox
proxy for N vs 4N executors) — results land in BENCH/BASELINE.md via
``--scaling --write-md``.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _pages_n(sf_dir: str) -> int:
    if "sf0.1" in sf_dir:
        return 50_000
    if "sf0.01" in sf_dir:
        return 5_000
    return 1_000


def _mk_spark(cpus: str, shuffle_partitions: int | None = None):
    from dqmtools_spark.session import get_spark

    # 8g default heap throttles string-heavy codegen at 16+ threads
    # (GC pressure); the box has 128 GiB
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    sp = get_spark(
        app_name="dqmtools_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or 2 * int(cpus),
    )
    sp.sparkContext.setLogLevel("ERROR")
    return sp


def _sync_fs() -> None:
    """Flush dirty pages OUTSIDE any timed region.  The bench writes
    parquet (synth input, staged checkpoints); without a barrier the
    kernel's writeback lands inside whichever later timed region
    happens to trigger it — BENCH r4 §9 measured a 5x pipeline
    inflation and the r4 driver run showed 3-4x swings on queries that
    write nothing themselves (minhash_pairs, cosine_knn).  ``os.sync``
    is cheap when the cache is clean and bounds the damage when not."""
    try:
        os.sync()
    except (AttributeError, OSError):
        pass


def run_pipeline_bench(
    spark, n_docs: int, real_models: bool = True
) -> tuple[float, int, list[float], float, float]:
    """Returns (fused best seconds, docs processed, fused per-rep
    seconds, staged best seconds, best seconds with the REAL model
    artifacts injected).

    The HEADLINE is the fused pipeline (``run_pipeline``: scan -> one
    Arrow stage -> codegen -> aggregate) — a write-free timed region,
    so it measures compute throughput, not the host's page-cache
    flushing.  The staged variant (phase-1 parquet checkpoint between
    the Python and JVM phases — the durable/resumable production flow)
    is timed separately because its checkpoint WRITE is part of the
    operation; the r2-r4 driver history shows that making it the
    headline couples the number to exogenous dirty-page state
    (9,355 -> 4,702 -> 1,612 docs/s across identical code).

    Input is materialized to parquet outside the timer and read back —
    both because that is the production shape (an Iceberg/parquet scan)
    and because Spark's deserialized ``.cache()`` read does NOT scale
    with cores (measured 0.56 scaling efficiency 4->16 for codegen
    consumers vs 0.90 from parquet — block-store contention).  A warmup
    run forces codegen compilation + Python-worker spawn before the
    timer so the number is steady-state throughput (what a long-running
    cluster job sees), not JVM warmup."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dqmtools_spark.pipeline import run_pipeline, run_pipeline_staged
    from dqmtools_spark.synth import synth_pages

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    path = os.path.join(tmp, "pages")
    n_parts = max(64, 4 * spark.sparkContext.defaultParallelism)
    synth_pages(spark, n_docs, seed=42).repartition(n_parts).write.parquet(path)
    pages = spark.read.parquet(path)
    n = pages.count()

    warm, _ = run_pipeline(spark, synth_pages(spark, 20_000, seed=7))
    warm.agg(F.count_if(F.col("keep")), F.sum(F.length("scrubbed_text"))).collect()

    def timed_fused() -> float:
        # force full computation incl. scrub text, no row collection;
        # NOTE: a fresh DataFrame per run — Spark 4 memoizes collect()
        # results on the same DataFrame object
        t0 = time.perf_counter()
        result, _ = run_pipeline(spark, spark.read.parquet(path))
        result.agg(
            F.count(F.lit(1)),
            F.count_if(F.col("keep")),
            F.sum(F.length("scrubbed_text")),
        ).collect()
        return time.perf_counter() - t0

    # one uncounted rep of the EXACT timed plan (the synth warmup above
    # spawns Python workers but codegens a mapInPandas-source plan, not
    # the parquet-scan plan — measured ~1.5s first-rep compile tax),
    # then flush writeback before the timers
    timed_fused()
    _sync_fs()

    # best of THREE timed runs.  Per-rep times are returned so an
    # exogenous host spike (documented >2x variance on this box; the
    # r3/r4 driver runs recorded them) shows up as one outlier rep
    # instead of silently becoming the headline.
    reps = [round(timed_fused(), 3) for _ in range(3)]

    def timed_staged(i: int) -> float:
        _sync_fs()  # the PREVIOUS rep's checkpoint flush is not this rep's cost
        t0 = time.perf_counter()
        result, _ = run_pipeline_staged(
            spark, spark.read.parquet(path), os.path.join(tmp, f"ckpt{i}")
        )
        result.agg(
            F.count(F.lit(1)),
            F.count_if(F.col("keep")),
            F.sum(F.length("scrubbed_text")),
        ).collect()
        return time.perf_counter() - t0

    staged_best = round(min(timed_staged(i) for i in range(2)), 3)

    # one more pair of runs with the REAL committed artifacts (fastText
    # .bin langid + ARPA 3-gram LM, scripts/train_models.py) riding the
    # UDF closure — records what swapping the stand-ins for genuine
    # models costs in the Arrow-batched Python stage
    real_best = 0.0
    if real_models:
        # path-based handles: each Python worker loads the artifacts
        # once and keeps its token/n-gram memos warm across tasks
        # (closure-shipped bound methods re-unpickle per task, cold)
        from dqmtools_spark.functions.models import (
            langid_fn_from_path,
            ppl_fn_from_path,
        )

        art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
        models = {
            "langid_fn": langid_fn_from_path(
                os.path.join(art, "langid_synth.bin")
            ),
            "ppl_fn": ppl_fn_from_path(
                os.path.join(art, "webtext_en_3gram.arpa.gz")
            ),
        }
        _sync_fs()

        def timed_real() -> float:
            t0 = time.perf_counter()
            result, _ = run_pipeline(spark, spark.read.parquet(path), models=models)
            result.agg(
                F.count(F.lit(1)),
                F.count_if(F.col("keep")),
                F.sum(F.length("scrubbed_text")),
            ).collect()
            return time.perf_counter() - t0

        real_best = round(min(timed_real() for _ in range(2)), 3)
    shutil.rmtree(tmp, ignore_errors=True)
    return min(reps), n, reps, staged_best, real_best


def run_query_bench(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    names = [
        "pricing_summary",
        "multi_join_agg",
        "latest_per_key",
        "quality_keep_summary",
        "doc_token_count",
        "cosine_knn",
        "minhash_pairs",
        "simhash_pairs",
        "salted_source_agg",
        "desparsify_check",
        "cube_metrics",
        # round-3 operators (additive keys — earlier rounds' entries
        # stay comparable across BENCH_r{N} files)
        "asof_latest_click",
        "event_sessions",
        "url_canon_dedup",
        "cms_user_counts",
        "range_interval_join",
        # round-4 operators
        "dup_ngram_spans",
        "remove_dup_spans",
        # round-5 operators
        "remove_dup_spans_max",
        "embedding_dup_lsh_banded",
    ]
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    _sync_fs()  # pipeline-bench tmp-dir writeback settles before query timing
    for name in names:
        # best-of-2 WITHIN this invocation: the first execution of a
        # query pays plan compile + codegen (15-40s across a cold
        # session); a one-shot driver run would report that warmup as
        # throughput (BENCH_r01 measured 2.2x uniform inflation).  The
        # DataFrame is rebuilt per run — Spark 4 memoizes actions on
        # the same DataFrame object — AND the cache is cleared per rep:
        # eager queries persist their (small) result, and Spark's
        # CacheManager matches canonicalized PLANS, not objects, so a
        # second run of an identical query would otherwise read rep 1's
        # cache and report a fake number (measured 2.7s -> 0.6s on the
        # banded-LSH query).
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


SCALING_SMALL = os.environ.get("SPARK_GRAFT_SCALING_SMALL", "4")
SCALING_LARGE = os.environ.get("SPARK_GRAFT_SCALING_LARGE", "16")


def scaling_run(n_docs: int) -> dict:
    """Same pipeline, same input, local[N] then local[4N].

    Default pair is 4 vs 16 cores: every local[k] pipeline stage runs k
    JVM task threads PLUS k Python UDF workers concurrently, so
    local[32] on this 32-core box oversubscribes 2:1 and under-reports
    the 4N point — a distortion a real 4N-executor cluster (each
    executor bringing its own cores) does not have.  4/16 keeps even
    the large configuration within the machine (16+16=32).

    Each size runs in a FRESH python subprocess: stopping a SparkSession
    and building another in one process leaves the Python-accumulator
    socket pointing at the dead JVM (PythonAccumulatorV2.merge fails on
    the second run)."""
    import subprocess

    results = {}
    for cpus in (SCALING_SMALL, SCALING_LARGE):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-one", cpus],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_BENCH_DOCS": str(n_docs)},
            cwd=os.path.dirname(os.path.abspath(__file__)),
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    ratio = int(SCALING_LARGE) / int(SCALING_SMALL)
    tn, t4n = (
        results[SCALING_SMALL]["docs_per_sec"],
        results[SCALING_LARGE]["docs_per_sec"],
    )
    results[f"efficiency_{SCALING_SMALL}_to_{SCALING_LARGE}"] = round(
        (t4n / tn) / ratio, 3
    )
    return results


def scaling_one(cpus: str, n_docs: int) -> None:
    spark = _mk_spark(cpus)
    dt, n, _, _, _ = run_pipeline_bench(spark, n_docs, real_models=False)
    print(json.dumps({"sec": round(dt, 3), "docs_per_sec": round(n / dt, 1)}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", _pages_n(sf_dir)))

    if "--scaling-one" in sys.argv:
        scaling_one(sys.argv[sys.argv.index("--scaling-one") + 1], n_docs)
        return

    if "--scaling-threads" in sys.argv:
        # secondary evidence: one JVM, local[N] vs local[4N] task
        # threads (known to under-report — see scripts/scaling_exec.py)
        n_scaling = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "400000"))
        res = scaling_run(n_scaling)
        print(json.dumps({"scaling": res, "n_docs": n_scaling}))
        return

    if "--scaling" in sys.argv:
        # primary evidence: N vs 4N executor PROCESSES (each its own
        # JVM + Python workers, like real executors) on disjoint shards
        import subprocess

        n_scaling = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "120000"))
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "scripts", "scaling_exec.py"),
                "--docs", str(n_scaling), "--cpus", "2", "--repeats", "3",
            ],
            capture_output=True, text=True, check=True,
        )
        print(out.stdout.strip().splitlines()[-1])
        return

    spark = _mk_spark(cpus)
    queries: dict[str, float] = {}
    pipe_sec, n, pipe_reps, staged_sec, real_sec = run_pipeline_bench(spark, n_docs)
    queries["pipeline"] = round(pipe_sec, 3)
    queries.update(run_query_bench(spark, sf_dir))
    total = round(sum(queries.values()), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "pipeline_docs": n,
                "pipeline_docs_per_sec": round(n / pipe_sec, 1),
                "pipeline_rep_sec": pipe_reps,
                "pipeline_staged_sec": staged_sec,
                "pipeline_staged_docs_per_sec": round(n / staged_sec, 1)
                if staged_sec
                else None,
                "pipeline_real_models_sec": real_sec,
                "pipeline_real_models_docs_per_sec": round(n / real_sec, 1)
                if real_sec
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
