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


def test_windowed_keep_counts_with_watermark(spark, tmp_path):
    """Event-time windowed agg + watermark over a stream; values must
    equal the same expression run as a plain batch groupBy."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dqmtools_spark.streaming.stream import windowed_keep_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        ts = base + dt.timedelta(minutes=i)          # spans two 1h windows
        text = "word " * (20 if i % 3 else 5)
        rows.append((f"u{i}", ts, text.encode(), text, "en"))
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    inp = str(tmp_path / "in")
    df.coalesce(2).write.parquet(inp)

    stream = (
        spark.readStream.schema(df.schema).parquet(inp)
    )
    q = (
        windowed_keep_counts(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("winkeep")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["lang"]): (r["n_docs"], r["n_min_len_ok"])
        for r in spark.sql("SELECT * FROM winkeep").collect()
    }
    want = {
        (r["win_start"], r["lang"]): (r["n_docs"], r["n_min_len_ok"])
        for r in windowed_keep_counts(df).collect()   # batch: watermark no-op
    }
    # append mode emits only windows finalized by the watermark; every
    # emitted window must match the batch ground truth, and at least
    # the first (closed) window must have been emitted
    assert got, "no window finalized"
    for k, v in got.items():
        assert want[k] == v, k
    counts = [v[0] for v in want.values()]
    assert sum(counts) == 120


def test_streaming_first_occurrence_dedups_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: duplicates within a batch AND in a
    later micro-batch are dropped; only first occurrences pass."""
    import datetime as dt

    from dqmtools_spark.streaming.stream import streaming_first_occurrence

    base = dt.datetime(2024, 1, 1)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def page(url, minute, text):
        return (url, base + dt.timedelta(minutes=minute), text.encode(), text, "en")

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: A twice (in-batch dup), B once
    spark.createDataFrame(
        [page("a1", 0, "content A"), page("a2", 1, "content A"),
         page("b1", 2, "content B")], schema
    ).coalesce(1).write.parquet(inp)

    def run_once():
        # parquet sink (memory sink cannot recover from a checkpoint);
        # state lives in the checkpoint across restarts
        stream = spark.readStream.schema(spark.read.parquet(inp).schema).parquet(inp)
        q = (
            streaming_first_occurrence(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got1 == {"a1", "b1"}          # earliest per hash; in-batch dup dropped

    # batch 2: A again (cross-batch dup) + new C — state must survive
    # the restart via the checkpoint
    spark.createDataFrame(
        [page("a3", 9, "content A"), page("c1", 10, "content C")], schema
    ).coalesce(1).write.mode("append").parquet(inp)
    run_once()
    got2 = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got2 == {"a1", "b1", "c1"}, "cross-batch duplicate must be dropped"


def test_session_window_stream_matches_batch_sessionize(spark, tmp_path):
    """Native session_window on a stream == the batch lag+running-sum
    sessionizer (operators/sessions.py) on the same data: same session
    boundaries (no gap hits the exact threshold here — the two
    implementations use >= vs > at the boundary), same per-session
    event counts, sess_start == the session's first event."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dqmtools_spark.operators.sessions import sessionize
    from dqmtools_spark.streaming.stream import session_metrics

    base = dt.datetime(2024, 1, 1)
    rows = []
    # two keys; bursts separated by > 30min gaps
    for k, offsets in {
        "en": [0, 5, 9, 50, 52, 120],
        "de": [0, 40, 41, 44, 200],
    }.items():
        for i, off in enumerate(offsets):
            rows.append((f"u{k}{i}", base + dt.timedelta(minutes=off), k))
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, lang string")
    inp = str(tmp_path / "in")
    df.coalesce(1).write.parquet(inp)

    q = (
        session_metrics(
            spark.readStream.schema(df.schema).parquet(inp),
            gap="30 minutes",
        )
        .writeStream.format("memory")
        .queryName("sessmet")
        # complete mode: the backlog ends before the watermark passes
        # the final open sessions, so append would withhold them
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["lang"], r["sess_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessmet").collect()
    }

    batch = (
        sessionize(df, "lang", "warc_ts", gap_minutes=30, tiebreak="url")
        .groupBy("lang", "session_seq")
        .agg(
            F.min("warc_ts").alias("start"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {(r["lang"], r["start"]): r["n_events"] for r in batch.collect()}
    assert got == want and len(want) == 3 + 3  # en: 3 sessions, de: 3


def test_session_window_state_survives_restart(spark, tmp_path):
    """Kill-and-resume for session_window state (the discipline
    test_streaming_first_occurrence already applies to dedup state):
    an OPEN session checkpointed by run 1 must MERGE with an in-gap
    event arriving after a restart, and finalize with the combined
    count once the watermark passes — exactly-once session semantics
    across restarts.  Parquet sink + append mode (memory sink cannot
    recover from a checkpoint; append is the production mode — closed
    sessions are emitted exactly once, open ones withheld)."""
    import datetime as dt

    from dqmtools_spark.streaming.stream import session_metrics

    base = dt.datetime(2024, 1, 1)
    schema = "url string, warc_ts timestamp, lang string"
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def m(minutes):
        return base + dt.timedelta(minutes=minutes)

    def write(rows, mode="append"):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            mode
        ).parquet(inp)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            session_metrics(stream, gap="30 minutes", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    def read_out():
        df = spark.read.parquet(out)
        return {
            (r["lang"], r["sess_start"], r["sess_end"]): r["n_events"]
            for r in df.collect()
        }

    # run 1: two open sessions — watermark (max_ts - 1h) is before both,
    # so NOTHING may be emitted; their state lives in the checkpoint
    write(
        [("e0", m(0), "en"), ("e1", m(5), "en"), ("e2", m(10), "en"),
         ("d0", m(0), "de"), ("d1", m(10), "de")],
    )
    run_once()
    assert not read_out(), "open sessions must be withheld in append mode"

    # run 2 (RESTART): d2 lands 15 min after d1 — inside the 30-min gap
    # of the checkpointed open de session, so it must merge into it
    write([("d2", m(25), "de")])
    run_once()

    # run 3 (second restart): far-future event advances the watermark
    # past both sessions' close; they finalize with merged counts
    write([("w0", m(600), "en")])
    run_once()

    got = read_out()
    assert got.get(("en", m(0), m(40))) == 3, got
    assert got.get(("de", m(0), m(55))) == 3, (
        "de session did not merge across the restart: %s" % got
    )
    # each closed session emitted exactly once, the open one withheld
    assert len(got) == 2, got
