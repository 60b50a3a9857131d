"""Resume idempotence (north rule; SURVEY §5 property 4).

Kill-after-partial-write is simulated by running with a subset of
buckets persisted, then resuming: the final table must equal the
one-shot run exactly, with no duplicate urls.
"""

from __future__ import annotations

import pytest

from dqmtools_spark.pipeline import run_pipeline
from dqmtools_spark.sources.checkpoint import CheckpointedRun
from dqmtools_spark.sources.tables import read_table
from dqmtools_spark.synth import synth_pages

N_BUCKETS = 8


@pytest.fixture()
def doc_results(spark):
    pages = synth_pages(spark, 200, seed=11)
    res, _ = run_pipeline(spark, pages, n_buckets=N_BUCKETS)
    return res.cache()


def test_run_then_resume_is_noop(spark, tmp_path, doc_results):
    ck = CheckpointedRun(spark, str(tmp_path / "out"))
    first = ck.run(doc_results, N_BUCKETS)
    assert first["docs_written"] == 200 and not first["skipped"]
    again = ck.run(doc_results, N_BUCKETS)
    assert again["skipped"] and again["docs_written"] == 0
    table = read_table(spark, ck.results_path)
    assert table.count() == 200
    assert table.select("url").distinct().count() == 200


def test_partial_write_resumes_without_duplicates(spark, tmp_path, doc_results):
    """Simulate a kill after data landed but before progress was marked
    for half the buckets — the write-ahead ordering's failure window."""
    ck = CheckpointedRun(spark, str(tmp_path / "out"))
    from dqmtools_spark.sources.tables import write_table
    from pyspark.sql import functions as F

    # data for buckets 0-3 is durable, but NO progress rows exist (the
    # crash happened between the two writes)
    partial = doc_results.filter(F.col("part_key") < 4)
    write_table(partial, ck.results_path, partition_by=["part_key"])

    summary = ck.run(doc_results, N_BUCKETS)
    assert not summary["skipped"]
    table = read_table(spark, ck.results_path)
    assert table.count() == 200, "anti-join must prevent duplicates"
    assert table.select("url").distinct().count() == 200
    # progress now covers every bucket
    assert ck.done_buckets() == set(range(N_BUCKETS))


def test_progress_counters(spark, tmp_path, doc_results):
    ck = CheckpointedRun(spark, str(tmp_path / "out"))
    ck.run(doc_results, N_BUCKETS)
    prog = read_table(spark, ck.progress_path).toPandas()
    assert int(prog["docs_in"].sum()) == 200
    assert 0 < int(prog["docs_out"].sum()) <= 200


def test_counters_complete_after_resume(spark, tmp_path, doc_results):
    """Per-bucket counters are derived from the WRITTEN partitions, so
    after a kill/resume they reflect each bucket's complete contents
    (pre-kill rows + resumed delta), not just this attempt's delta."""
    from pyspark.sql import functions as F

    from dqmtools_spark.sources.tables import write_table

    ck = CheckpointedRun(spark, str(tmp_path / "out"))
    partial = doc_results.filter(F.col("part_key") < 4)
    write_table(partial, ck.results_path, partition_by=["part_key"])
    ck.run(doc_results, N_BUCKETS)
    prog = read_table(spark, ck.progress_path).toPandas()
    assert int(prog["docs_in"].sum()) == 200, "resumed counters must be complete"


def test_wide_bucket_count_constant_observe_width(spark, tmp_path):
    """n_buckets=4096: the run must not build O(n_buckets) observation
    expressions (the r2 form put 2 x 4096 count_if aggregates into one
    projection — a codegen hazard).  The input is still scanned once;
    per-bucket counters come from a partition-pruned scan of the
    written files."""
    from dqmtools_spark.pipeline import run_pipeline
    from dqmtools_spark.synth import synth_pages

    wide = 4096
    pages = synth_pages(spark, 150, seed=13)
    res, _ = run_pipeline(spark, pages, n_buckets=wide)
    ck = CheckpointedRun(spark, str(tmp_path / "wide"))
    summary = ck.run(res.cache(), wide)
    assert summary["docs_written"] == 150
    assert summary["buckets_done"] == wide
    table = read_table(spark, ck.results_path)
    assert table.count() == 150
    prog = read_table(spark, ck.progress_path).toPandas()
    assert len(prog) == wide
    assert int(prog["docs_in"].sum()) == 150
    again = ck.run(res, wide)
    assert again["skipped"]
