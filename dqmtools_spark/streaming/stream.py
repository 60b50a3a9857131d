"""Streaming ingestion: the batch pipeline applied per micro-batch.

The reference has no true streaming (SURVEY §2.9) — its display server
polls a directory and results append incrementally
(``dqm_display.py:53-56``, ``dqmtools.py:99-104``).  The idiomatic
Spark upgrade is a file-source ``readStream`` + ``foreachBatch`` that
reuses the exact batch pipeline (one code path, two execution modes),
with checkpointing for exactly-once sink appends.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from dqmtools_spark.schemas import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    batch_hook: Callable[[DataFrame, int], None] | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for new pages parquet files; run the quality
    pipeline on each micro-batch; append doc_results to ``output_dir``.

    ``trigger_once`` processes the backlog and stops (the batch-like
    mode used in tests); continuous deployments pass False.
    """
    from dqmtools_spark.pipeline import run_pipeline

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        result, _ = run_pipeline(spark, batch_df)
        (
            result.write.mode("append")
            .partitionBy("part_key")
            .parquet(output_dir)
        )
        if batch_hook is not None:
            batch_hook(result, batch_id)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
