"""Streaming wrapper: micro-batch pipeline over a file source with
exactly-once checkpointing (SURVEY §2.9 — the reference's incremental
append loop, upgraded to Structured Streaming)."""

from __future__ import annotations

import os


def test_stream_processes_backlog_and_checkpoints(spark, tmp_path):
    from dqmtools_spark.streaming.stream import stream_pages
    from dqmtools_spark.synth import synth_pages

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    synth_pages(spark, 200, seed=5).coalesce(2).write.parquet(inp)

    batches: list[int] = []
    q = stream_pages(
        spark, inp, out, ckpt,
        batch_hook=lambda df, bid: batches.append(bid),
    )
    q.awaitTermination(120)

    result = spark.read.parquet(out)
    assert result.count() == 200
    assert set(result.columns) >= {"url", "keep", "scrubbed_text", "lang_pred"}
    assert len(batches) >= 1

    # second start with the same checkpoint: backlog already committed,
    # no new files -> zero new rows appended (exactly-once)
    q2 = stream_pages(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 200

    # new files arriving -> only the delta is processed
    synth_pages(spark, 50, seed=6).coalesce(1).write.mode("append").parquet(inp)
    q3 = stream_pages(spark, inp, out, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 250
    assert os.path.isdir(ckpt)
