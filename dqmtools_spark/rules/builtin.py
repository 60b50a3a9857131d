"""Default Gopher/C4-style rule suite + per-language threshold table.

Analog of the reference's parameterized rule families (R8,
wibeth_tests.py:54-156: one class, (field, expected) params stamped into
11 rules) and per-class threshold broadcast (R9,
wibeth_tests.py:220-230): here a config table of (rule, threshold) and a
small per-language threshold DataFrame broadcast-joined on ``lang_pred``
(J2, the canonical broadcast hash join).

Thresholds are part of the keep/drop contract — the pytest reference
labeler imports THRESHOLDS/LANG_THRESHOLDS from here so both sides
score identically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqmtools_spark.rules.core import QualityRule, RuleRegistry

# Global scalar thresholds (C4/Gopher-ish).
THRESHOLDS = {
    "min_word_count": 15,
    "max_word_count": 10_000,
    "min_mean_word_len": 1.5,
    "max_mean_word_len": 12.0,
    "max_symbol_ratio": 0.08,
    "max_repeated_line_fraction": 0.30,
    "min_alpha_word_fraction": 0.60,
    "max_ellipsis_line_fraction": 0.30,
    "max_bullet_line_fraction": 0.90,
}

# Per-language thresholds (broadcast dim table — R9/J2).
# zh has no whitespace stop-words and an OOV-heavy LM, so its
# stopword floor is 0 and its perplexity ceiling is effectively off.
LANG_THRESHOLDS = [
    {"lang_pred": "en", "thr_stopword_min": 0.12, "thr_ppl_max": 400.0},
    {"lang_pred": "fr", "thr_stopword_min": 0.12, "thr_ppl_max": 400.0},
    {"lang_pred": "es", "thr_stopword_min": 0.12, "thr_ppl_max": 400.0},
    {"lang_pred": "de", "thr_stopword_min": 0.12, "thr_ppl_max": 400.0},
    {"lang_pred": "zh", "thr_stopword_min": 0.0, "thr_ppl_max": 1.0e12},
]


def lang_thresholds_df(
    spark: SparkSession, rows: list[dict] | None = None
) -> DataFrame:
    return spark.createDataFrame(pd.DataFrame(rows or LANG_THRESHOLDS))


def default_registry(thresholds: dict | None = None) -> RuleRegistry:
    """Rules over the stats columns produced by the pipeline.

    Each is a pure Column expression (JVM-side); ``requires`` drives the
    missing-input→WARNING path (R7).  ``thresholds`` overrides any
    subset of :data:`THRESHOLDS` — the reference's per-detector-config
    threshold selection (``scripts/dqm_analyzer.py:29-45``, R9) as a
    config dict; unknown keys raise (catch typos at build, not at
    100 TB runtime).
    """
    t = dict(THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(t)
        if unknown:
            raise ValueError(f"unknown threshold keys: {sorted(unknown)}")
        t.update(thresholds)
    reg = RuleRegistry()

    def mk(name: str, group: str, requires: tuple[str, ...], build):
        reg.register(QualityRule(name, build, group, requires))

    mk(
        "min_word_count", "gopher", ("word_count",),
        lambda df: df["word_count"] >= t["min_word_count"],
    )
    mk(
        "max_word_count", "gopher", ("word_count",),
        lambda df: df["word_count"] <= t["max_word_count"],
    )
    mk(
        "mean_word_len", "gopher", ("mean_word_len",),
        lambda df: df["mean_word_len"].between(
            t["min_mean_word_len"], t["max_mean_word_len"]
        ),
    )
    mk(
        "max_symbol_ratio", "c4", ("symbol_ratio",),
        lambda df: df["symbol_ratio"] <= t["max_symbol_ratio"],
    )
    mk(
        "repeated_lines", "c4", ("repeated_line_fraction",),
        lambda df: df["repeated_line_fraction"] <= t["max_repeated_line_fraction"],
    )
    mk(
        "alpha_words", "c4", ("alpha_word_fraction",),
        lambda df: df["alpha_word_fraction"] >= t["min_alpha_word_fraction"],
    )
    mk(
        "ellipsis_lines", "gopher", ("ellipsis_line_fraction",),
        lambda df: df["ellipsis_line_fraction"] <= t["max_ellipsis_line_fraction"],
    )
    mk(
        "bullet_lines", "gopher", ("bullet_line_fraction",),
        lambda df: df["bullet_line_fraction"] <= t["max_bullet_line_fraction"],
    )
    mk(
        "no_curly_braces", "c4", ("has_curly_brace",),
        lambda df: ~df["has_curly_brace"],
    )
    # per-language thresholds arrive via broadcast join (J2/R9)
    mk(
        "stopword_fraction", "gopher", ("stopword_fraction", "thr_stopword_min"),
        lambda df: df["stopword_fraction"] >= df["thr_stopword_min"],
    )
    mk(
        "max_perplexity", "lm", ("perplexity", "thr_ppl_max"),
        lambda df: df["perplexity"] <= df["thr_ppl_max"],
    )
    return reg


def join_lang_thresholds(
    df: DataFrame, spark: SparkSession, rows: list[dict] | None = None
) -> DataFrame:
    """Broadcast the 5-row threshold dim onto the doc stream (J2)."""
    return df.join(
        F.broadcast(lang_thresholds_df(spark, rows)), on="lang_pred", how="left"
    )
