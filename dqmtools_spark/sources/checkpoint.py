"""Checkpointed, resumable pipeline runs (north rule).

Semantics rebuilt from the reference's checkpoint pair
(``write_dqm_dataframes.py`` → ``read_dqm_dataframes.py``), upgraded
from "re-run the whole file" to partition-level resume:

- doc_results land in a table partitioned by ``part_key``
  (= ``pmod(xxhash64(url), n_buckets)`` — deterministic, so the same
  url always belongs to the same partition across runs/cluster sizes).
- a ``progress`` table records per-partition lineage + counters
  (docs_in/docs_out, run_id, timestamps).
- resume = process only buckets NOT marked done; within a re-run of an
  unfinished bucket, ``left_anti`` against already-written urls makes
  the write idempotent (no duplicate outputs after a mid-bucket kill).

At 100 TB the anti-join is bucket-local: both sides are filtered to the
resuming buckets first, so the join input is the unfinished slice, not
the whole corpus, and AQE picks a broadcast when the written slice is
small.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqmtools_spark.sources.tables import read_table, table_exists, write_table


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


class CheckpointedRun:
    """Manage one resumable pipeline output location."""

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        self.spark = spark
        self.base = base_dir
        self.run_id = run_id
        self.results_path = os.path.join(base_dir, "doc_results")
        self.progress_path = os.path.join(base_dir, "progress")

    # ---------------------------------------------------------- state

    def done_buckets(self) -> set[int]:
        if not table_exists(self.spark, self.progress_path):
            return set()
        rows = (
            read_table(self.spark, self.progress_path)
            .filter(F.col("status") == "done")
            .select("part_key")
            .distinct()
            .collect()
        )
        return {r["part_key"] for r in rows}

    def written_urls(self, buckets: list[int]) -> DataFrame | None:
        """urls already persisted for the given (unfinished) buckets."""
        if not table_exists(self.spark, self.results_path):
            return None
        return (
            read_table(self.spark, self.results_path)
            .filter(F.col("part_key").isin(buckets))
            .select("url", "part_key")
        )

    # ---------------------------------------------------------- run

    def run(self, doc_results: DataFrame, n_buckets: int) -> dict:
        """Write pending work idempotently; returns counter summary.

        ``doc_results`` must carry ``part_key`` (added by the pipeline).
        """
        done = self.done_buckets()
        pending = [b for b in range(n_buckets) if b not in done]
        if not pending:
            return {"buckets_done": len(done), "docs_written": 0, "skipped": True}

        work = doc_results.filter(F.col("part_key").isin(pending))
        already = self.written_urls(pending)
        if already is not None:
            work = work.join(
                already.select("url"), on="url", how="left_anti"
            )

        # one exchange: cluster by bucket so each output partition is a
        # single task's atomic write
        work = work.repartition(max(len(pending), 1), "part_key")
        # per-bucket counters ride the write itself as observation
        # metrics — ONE job, ONE scan, nothing cached.  (The former
        # cache() + groupBy pre-pass materialized the entire pending
        # slice and scanned it twice; at 100 TB that is the difference
        # between one pass and caching the corpus.)  Counter caveat
        # shared with accumulators: a re-executed task counts twice —
        # counters are lineage diagnostics, not the resume gate (the
        # gate is the anti-join + progress table).
        from pyspark.sql import Observation

        obs = Observation()
        per_bucket_exprs = []
        for b in pending:
            per_bucket_exprs.append(
                F.count_if(F.col("part_key") == b).alias(f"in_{b}")
            )
            per_bucket_exprs.append(
                F.count_if((F.col("part_key") == b) & F.col("keep")).alias(
                    f"out_{b}"
                )
            )
        work = work.observe(obs, F.count(F.lit(1)).alias("total"), *per_bucket_exprs)
        # the write runs even when the pending slice turns out empty
        # (an empty append writes no part files) — knowing total before
        # the action would cost the extra counting pass this rewrite
        # removed; one empty job per fully-resumed re-submit is cheaper
        write_table(work, self.results_path, partition_by=["part_key"])
        counters = obs.get
        total = int(counters["total"])
        per_bucket = {
            b: (int(counters[f"in_{b}"]), int(counters[f"out_{b}"]))
            for b in pending
        }

        # mark progress AFTER data is durable (write-ahead ordering:
        # a kill between the two writes re-runs the bucket; the
        # anti-join makes that re-run a no-op — idempotence, not loss)
        now = _now()
        prog_rows = [
            {
                "part_key": int(b),
                "status": "done",
                "docs_in": int(per_bucket.get(b, (0, 0))[0]),
                "docs_out": int(per_bucket.get(b, (0, 0))[1]),
                # lineage: which run completed this bucket — a resumed
                # job's buckets carry the resuming run's id
                "run_id": self.run_id,
                "updated": now,
            }
            for b in pending
        ]
        from dqmtools_spark.schemas import PROGRESS_SCHEMA

        write_table(
            self.spark.createDataFrame(prog_rows, PROGRESS_SCHEMA),
            self.progress_path,
        )
        return {
            "buckets_done": len(done) + len(pending),
            "docs_written": total,
            "skipped": False,
        }
