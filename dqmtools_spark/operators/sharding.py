"""Training-shard assignment: pack documents into ~equal-token shards.

A training-data pipeline's last step before tokenization is usually
"write shards of ~N tokens each".  The deterministic greedy packing —
walk the corpus in a stable order, cut a new shard every ``budget``
tokens — is a running-sum window:

    shard(doc) = floor((cumsum(tokens) - tokens) / budget)

i.e. the shard the document's FIRST token lands in.  Deterministic,
reproducible across runs and cluster sizes, and exactly expressible in
any engine: integer window sum + one INTEGER division (Spark ``div`` =
DuckDB ``//``; both non-negative here, so trunc = floor), exact over
the full int64 range — no 2^53 double ceiling.

Scale note: a single global ``ORDER BY`` window is a total sort — fine
for the report-sized query below, but at 10^12 docs you shard
hierarchically: partition by a hash prefix first, run this window per
partition with a per-partition budget, and concatenate shard id spaces
(``shard = partition * shards_per_partition + local``).  The operator
takes an optional ``partition_cols`` for exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_token_shards(
    df: DataFrame,
    token_count: Column,
    order_cols: list[str],
    budget: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``tokens`` and ``shard`` columns.

    ``shard`` = floor(exclusive-running-sum / budget) over
    ``order_cols`` (within ``partition_cols`` if given — the
    hierarchical 100 TB form).
    """
    base = (
        Window.partitionBy(*partition_cols) if partition_cols else Window
    )
    w = base.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tokens = token_count.cast("long")
    cum = F.sum(tokens).over(w)
    # PURE integer division (SQL `div`), not float-divide-then-floor:
    # double division is only exact while the cumulative sum < 2^53,
    # and a corpus-scale token count can exceed that — `div` stays
    # exact for the full int64 range in every engine (DuckDB `//`,
    # Spark `div`).
    return (
        df.withColumn("tokens", tokens)
        .withColumn("_excl_cum", cum - tokens)
        .withColumn("shard", F.expr(f"_excl_cum div {int(budget)}"))
        .drop("_excl_cum")
    )


def shard_summary(
    sharded: DataFrame, partition_cols: list[str] | None = None
) -> DataFrame:
    """Per-shard packing report: doc count, token total, bounds.

    In hierarchical mode pass the SAME ``partition_cols`` as
    :func:`assign_token_shards` — shard ids restart at 0 per partition,
    so grouping by ``shard`` alone would merge unrelated shards."""
    keys = [*(partition_cols or []), "shard"]
    return sharded.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.min("tokens").alias("min_doc_tokens"),
        F.max("tokens").alias("max_doc_tokens"),
    )
