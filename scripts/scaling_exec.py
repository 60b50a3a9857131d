"""Executor-process scaling harness (the N vs 4N evidence).

The north rule's criterion is throughput scaling efficiency between a
cluster of N executors and one of 4N executors.  A real Spark executor
is its own JVM with its own Python workers; the faithful single-box
proxy is therefore N CONCURRENT EXECUTOR PROCESSES (each a local[c]
session working a disjoint shard of the same input), NOT one JVM with
4N task threads — thread-mode local[4N] funnels all tasks through one
heap/codegen/Python-bridge and measurably distorts scaling (see
BENCH/BASELINE.md; a co-run experiment shows two separate 8-thread
sessions run at 100% of their solo speed on this box).

Protocol (strong scaling — identical input for both cluster sizes):
  1. --prepare materializes the shared pages table once (64 parquet
     files).
  2. For each cluster size k in {1, 4}: spawn k worker processes
     (local[c] each).  Worker i reads files where idx % k == i.
     Workers warm up (codegen + Python workers), signal READY, then
     block on a GO barrier so JVM startup is excluded and all workers
     start together.  Each runs the staged pipeline on its shard and
     reports its processing seconds.
  3. cluster time = max(worker seconds); efficiency =
     (docs_per_sec[4] / docs_per_sec[1]) / 4.

Shuffle traffic is not exercised (the per-doc pipeline is shuffle-free
by design — its one exchange is the partitioned write, bounded by disk
not interconnect), so executor-count scaling here measures exactly what
it would on a cluster: per-executor pipeline throughput.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare(path: str, n_docs: int, cpus: int) -> None:
    from dqmtools_spark.session import get_spark
    from dqmtools_spark.synth import synth_pages

    spark = get_spark(app_name="scaling_prepare", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    synth_pages(spark, n_docs, seed=42).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def worker(
    path: str, idx: int, n_execs: int, cpus: int, barrier: str, out: str
) -> None:
    from pyspark.sql import functions as F

    from dqmtools_spark.pipeline import run_pipeline, run_pipeline_staged
    from dqmtools_spark.session import get_spark
    from dqmtools_spark.synth import synth_pages

    spark = get_spark(app_name=f"exec{idx}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    shard = [f for i, f in enumerate(files) if i % n_execs == idx]

    # warm codegen + Python workers before the barrier
    warm, _ = run_pipeline(spark, synth_pages(spark, 10_000, seed=7))
    warm.agg(F.count_if(F.col("keep")), F.sum(F.length("scrubbed_text"))).collect()

    open(f"{barrier}.ready{idx}", "w").write("1")
    while not os.path.exists(f"{barrier}.go"):
        time.sleep(0.05)

    from dqmtools_spark.pipeline import _fold_results, jvm_phase, python_phase
    from dqmtools_spark.rules.builtin import default_registry

    t0 = time.perf_counter()
    ckpt = f"{barrier}.ckpt{idx}"
    python_phase(spark.read.parquet(*shard)).write.mode("overwrite").parquet(ckpt)
    t1 = time.perf_counter()
    enriched = jvm_phase(spark.read.parquet(ckpt), spark)
    result, _ = _fold_results(enriched, default_registry())
    row = result.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("keep")),
        F.sum(F.length("scrubbed_text")),
    ).collect()[0]
    dt = time.perf_counter() - t0
    with open(out, "w") as f:
        json.dump(
            {"sec": dt, "docs": row["n"],
             "py_sec": round(t1 - t0, 2), "jvm_sec": round(dt - (t1 - t0), 2)},
            f,
        )
    spark.stop()


def run_cluster(path: str, n_execs: int, cpus: int, tmp: str) -> dict:
    import subprocess

    barrier = os.path.join(tmp, f"bar{n_execs}")
    procs, outs = [], []
    for i in range(n_execs):
        out = os.path.join(tmp, f"out_{n_execs}_{i}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    "--path", path, "--idx", str(i), "--execs", str(n_execs),
                    "--cpus", str(cpus), "--barrier", barrier, "--out", out,
                ],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    while not all(os.path.exists(f"{barrier}.ready{i}") for i in range(n_execs)):
        if any(p.poll() is not None for p in procs):
            raise RuntimeError("worker died before barrier")
        time.sleep(0.1)
    open(f"{barrier}.go", "w").write("go")
    for p in procs:
        if p.wait() != 0:
            raise RuntimeError("worker failed")
    res = [json.load(open(o)) for o in outs]
    total_docs = sum(r["docs"] for r in res)
    cluster_sec = max(r["sec"] for r in res)
    return {
        "execs": n_execs,
        "cpus_per_exec": cpus,
        "sec": round(cluster_sec, 3),
        "docs": total_docs,
        "docs_per_sec": round(total_docs / cluster_sec, 1),
        "per_worker_sec": [round(r["sec"], 2) for r in res],
        "per_worker_py_sec": [r.get("py_sec") for r in res],
        "per_worker_jvm_sec": [r.get("jvm_sec") for r in res],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--path")
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--idx", type=int, default=0)
    ap.add_argument("--execs", type=int, default=1)
    ap.add_argument("--barrier")
    ap.add_argument("--out")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")

    if args.prepare:
        prepare(args.path, args.docs, cpus=8)
        return
    if args.worker:
        worker(args.path, args.idx, args.execs, args.cpus, args.barrier, args.out)
        return

    import subprocess
    import tempfile

    tmp = tempfile.mkdtemp(prefix="scaling_exec_")
    path = os.path.join(tmp, "pages")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prepare", "--path", path,
         "--docs", str(args.docs)],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # the sandbox host shows >2x exogenous run-to-run variance, so the
    # two cluster sizes are measured INTERLEAVED over --repeats trials
    # and each config's best trial (least host interference) is scored
    trials: dict[int, list[dict]] = {1: [], 4: []}
    for r in range(args.repeats):
        for k in (1, 4):
            trials[k].append(run_cluster(path, k, args.cpus, tmp))
    small = max(trials[1], key=lambda t: t["docs_per_sec"])
    large = max(trials[4], key=lambda t: t["docs_per_sec"])
    eff = round((large["docs_per_sec"] / small["docs_per_sec"]) / 4, 3)
    print(json.dumps({
        "mode": "executor-process scaling (N=1 vs 4N=4 executors)",
        "N": small, "4N": large,
        "efficiency_N_to_4N": eff,
        "n_docs": args.docs,
        "all_trials_docs_per_sec": {
            str(k): [t["docs_per_sec"] for t in v] for k, v in trials.items()
        },
    }))
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
