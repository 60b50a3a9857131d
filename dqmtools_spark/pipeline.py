"""End-to-end quality pipeline: pages -> doc_results (+ metrics).

Plan shape (one job, minimal shuffles):

  scan(url, warc_ts, html, lang)            -- column-pruned: text/html
    -> extract_text_udf(html)               -- Arrow batch, Python x1
    -> langid_udf / perplexity_udf / scrub_udf (same stage)
    -> stats columns (JVM codegen, no Python)
    -> broadcast join 5-row lang-threshold dim   (no shuffle)
    -> rule columns -> reasons/keep              (same codegen stage)
    -> write, repartitioned by part_key          (the ONLY shuffle)

At 100 TB this is scan → one narrow Python stage → one exchange for the
partitioned write.  Rule metrics are a separate aggregation over the
(cheap, already-computed) boolean columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqmtools_spark.functions import textstats
from dqmtools_spark.functions.udfs import (
    pii_hits_map_col,
    process_page_udf,
    process_text_udf,
)
from dqmtools_spark.rules.builtin import default_registry, join_lang_thresholds
from dqmtools_spark.rules.core import RuleBuildOutcome, RuleRegistry, evaluate_rules

DEFAULT_PART_BUCKETS = 64


def enrich_pages(
    df: DataFrame,
    spark: SparkSession,
    reextract: bool = True,
    n_buckets: int = DEFAULT_PART_BUCKETS,
) -> DataFrame:
    """pages -> pages + extracted text + lang_pred + stats + thresholds.

    ``reextract=True`` recomputes text from html (the byte-identical
    invariant path); False trusts the incoming ``text`` column.

    All four Python steps (extract, langid, perplexity, scrub) run
    fused in ONE Arrow round-trip; everything downstream (stats, rules,
    fold) is JVM codegen.
    """
    proc = (
        process_page_udf(F.col("html")) if reextract else process_text_udf(F.col("text"))
    )
    df = df.withColumn("_proc", proc)
    df = df.withColumn("text_ex", F.col("_proc.text_ex"))
    df = df.withColumn("lang_pred", F.col("_proc.lang_pred"))
    df = df.withColumn("perplexity", F.col("_proc.perplexity"))
    stats = textstats.all_stats(F.col("text_ex"))
    df = df.select("*", *[c.alias(name) for name, c in stats.items()])
    # deterministic partition key: hash-bucket of url (skew-free even
    # when one domain holds 30% of rows — url, not domain, is hashed)
    df = df.withColumn(
        "part_key", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )
    return join_lang_thresholds(df, spark)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    registry: RuleRegistry | None = None,
    reextract: bool = True,
    n_buckets: int = DEFAULT_PART_BUCKETS,
) -> tuple[DataFrame, list[RuleBuildOutcome]]:
    """Full per-document pipeline; returns (doc_results, rule outcomes)."""
    registry = registry or default_registry()
    enriched = enrich_pages(pages, spark, reextract=reextract, n_buckets=n_buckets)
    evaluated, outcomes = evaluate_rules(enriched, registry)
    n_applied = max(len([o for o in outcomes if o.column is not None]), 1)
    # quality score: fraction of rules passed (diagnostic, not gate)
    score = (
        (F.lit(n_applied) - F.size(F.col("reasons"))).cast("double") / n_applied
    ).alias("quality_score")
    result = evaluated.select(
        F.col("url"),
        F.col("keep"),
        F.col("reasons"),
        F.col("_proc.scrubbed_text").alias("scrubbed_text"),
        F.col("lang_pred"),
        score,
        pii_hits_map_col("_proc").alias("pii_hits"),
        F.col("part_key"),
    )
    return result, outcomes


def rule_metrics(evaluated: DataFrame, prefix: str = "pass_") -> DataFrame:
    """Docs in/out per rule per language — the counters the north rule
    requires; cube() gives per-lang, per-rule, and grand totals in one
    shuffle (the reference's nested suite summaries, SURVEY §2.5)."""
    pass_cols = [c for c in evaluated.columns if c.startswith(prefix)]
    aggs = [F.count(F.lit(1)).alias("docs_in"), F.count_if(F.col("keep")).alias("docs_out")] + [
        F.count_if(~F.col(c)).alias(f"fail_{c[len(prefix):]}") for c in pass_cols
    ]
    return evaluated.cube("lang_pred").agg(*aggs)
