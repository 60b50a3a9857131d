"""Explicit StructType schemas (SURVEY.md §1.3: fail-fast, not implicit).

The reference lets whatever the unpacker dataclasses emit become columns
(``dataframe_creator.py:192-201``); we pin schemas so a bad upstream file
fails at scan, not mid-rule at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

# North-rule input table (BASELINE.json input_hint):
# Common-Crawl-style web pages.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("warc_ts", T.TimestampType(), nullable=True),
        T.StructField("html", T.BinaryType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("lang", T.StringType(), nullable=True),
    ]
)

# Per-document pipeline output (analog of the reference's result rows
# {name, result, message, last_update} at dqmtools.py:75, per-unit).
DOC_RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("keep", T.BooleanType(), nullable=False),
        T.StructField("reasons", T.ArrayType(T.StringType()), nullable=False),
        T.StructField("scrubbed_text", T.StringType(), nullable=True),
        T.StructField("lang_pred", T.StringType(), nullable=True),
        T.StructField("quality_score", T.DoubleType(), nullable=True),
        T.StructField("pii_hits", T.MapType(T.StringType(), T.LongType()), nullable=True),
        T.StructField("part_key", T.IntegerType(), nullable=True),
    ]
)

# Rule-suite result table (reference result model, dqmtools.py:21-25,75):
# status domain {-1 INVALID, 0 BAD, 1 OK, 2 WARNING}.
RULE_RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("status", T.IntegerType(), nullable=False),
        T.StructField("message", T.StringType(), nullable=True),
        T.StructField("last_update", T.TimestampType(), nullable=False),
    ]
)

# Per-partition progress/lineage checkpoint (north rule: resumable with
# per-partition lineage + counters; analog of write_dqm_dataframes.py's
# HDF5 checkpoint, re-expressed as an idempotent table).
PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("part_key", T.IntegerType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("docs_in", T.LongType(), nullable=False),
        T.StructField("docs_out", T.LongType(), nullable=False),
        T.StructField("run_id", T.StringType(), nullable=False),
        T.StructField("updated", T.TimestampType(), nullable=False),
    ]
)

INVALID, BAD, OK, WARNING = -1, 0, 1, 2  # dqmtools.py:21-25
# Fold severity: BAD/INVALID dominate WARNING dominates OK
# (dqmtools.py:106-120). Rank for max()-fold:
SEVERITY_RANK = {OK: 0, WARNING: 1, BAD: 2, INVALID: 3}
