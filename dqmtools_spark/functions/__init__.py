"""Columnar functions: text statistics (Spark SQL exprs), text
extraction / language-ID / perplexity / PII-scrub (vectorized pandas
UDFs). No per-row Python UDFs anywhere (BASELINE input_hint)."""
