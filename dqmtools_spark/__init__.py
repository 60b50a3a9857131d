"""dqmtools_spark — a PySpark-native web-text quality engine.

A from-scratch rebuild of the capabilities of rdaguiar230341/dqmtools
(a single-process pandas data-quality-monitoring tool) as an idiomatic
Spark pipeline: language-ID + quality filtering + PII/toxicity scrub
over Common-Crawl-style web pages, expressed with the DataFrame API so
Catalyst/Tungsten/AQE own the physical plan.

Layout
------
- ``session``    : SparkSession factory tuned for the pipeline.
- ``schemas``    : explicit StructType schemas (pages, results, progress).
- ``synth``      : deterministic synthetic ``pages`` generator (seeded).
- ``sources``    : table readers/writers + checkpoint/resume (anti-join).
- ``functions``  : columnar text statistics, langid, perplexity, scrub.
- ``rules``      : the quality-rule registry + status-fold semantics
                   (the reference's distinctive layer, dqmtools.py:40-120).
- ``operators``  : dedup (exact/minhash/simhash/jaccard), similarity
                   search, latest-per-key, group-mode, sampling.
- ``plans``      : plan inspection helpers (explain/shuffle audit).
- ``streaming``  : foreachBatch wrapper around the batch pipeline.
- ``pipeline``   : end-to-end compose: pages -> doc_results + metrics.
"""

__version__ = "0.1.0"
