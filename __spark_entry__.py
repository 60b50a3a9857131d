"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality pipeline on sf0.001.
``queries()`` maps operator names (SURVEY.md §2 inventory + the
training-data operator set) to (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` holds the DuckDB-equivalent SQL for each
SQL-expressible entry.  Column names/aliases match pairwise — the
driver's compare sorts columns by name before hashing.

Float policy: aggregates that depend on summation order are rounded
(2-4 dp, error margins ~1e-6 of a rounding step); ratio-of-integer-sums
is used instead of avg-of-ratios wherever possible so both engines
produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqmtools_spark.functions.textstats import ALL_MARKERS

# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, scale: int = 2, prec: int = 12) -> F.Column:
    """Exact-decimal view of a money-like double column.

    Sums of double products land exactly on round-half boundaries
    (2dp x 2dp = 4dp values), where Spark's and DuckDB's last-ulp
    summation differences flip the rounded digit.  Doing the arithmetic
    in DECIMAL in BOTH engines removes the ambiguity; results are cast
    back to double at the end (exact decimal -> nearest double is
    deterministic and engine-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


_MARKER_SQL = ", ".join(f"'{m}'" for m in ALL_MARKERS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality pipeline over pages derived from the
    sf0.001 documents table — langid + stats + rules + scrub, folded to
    per-language keep/drop counts."""
    from dqmtools_spark.pipeline import run_pipeline

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    result, _ = run_pipeline(spark, pages, n_buckets=16)
    return (
        result.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.count_if(F.col("keep")).alias("kept"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )


# ---------------------------------------------------------------------------
# §2.5/§2.2 relational core
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: G4/G5/G10 aggregations + O1 sort."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"), 2, 4)
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_filter_compound(spark, sf):
    """P1/P2 compound boolean predicates (wibeth_tests.py:45,193,300)."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.03))
        & F.col("l_quantity").between(10, 40)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
    )


def q_filter_sql_string(spark, sf):
    """P3 string-query filter (dataframe_creator.py:172-181)."""
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.expr("event_type = 'error' AND value > 100"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


def q_project_compute(spark, sf):
    """P5 bitwise / P6 arithmetic / P9 casts (wibeth_tests.py:41-43,168)."""
    li = _t(spark, sf, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_orderkey").bitwiseAND(F.lit(0x7FFF)).alias("key_low15"),
        (F.floor((F.col("l_quantity") * 10) / 7) + 1).cast("long").alias("expected_frames"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.round(
            _dec("l_extendedprice")
            * _dec(F.lit(1) - F.col("l_discount"), 2, 4)
            * _dec(F.lit(1) + F.col("l_tax"), 2, 4),
            2,
        ).cast("double").alias("charge"),
    )


def q_broadcast_dim_join(spark, sf):
    """J2 small-dim broadcast join (wibeth_tests.py:240)."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("sum_acctbal"),
        )
    )


def q_multi_join_agg(spark, sf):
    """J1 multi-way equi-join + aggregation (TPC-H Q3 shape)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"), 2, 4)
            ).cast("double").alias("revenue")
        )
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"), "revenue")
    )


def q_semi_join_exists(spark, sf):
    """Semi-join (resume-style 'has results') per market segment."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_anti_join_resume(spark, sf):
    """Anti-join — the checkpoint-resume primitive (SURVEY §2.4)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o.select("o_custkey"), c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_dedup_then_join(spark, sf):
    """J5 dedup-before-join to prevent fanout (wibeth_tests.py:252)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    first_order = o.groupBy("o_custkey").agg(F.min("o_orderkey").alias("first_orderkey"))
    return (
        first_order.join(F.broadcast(c), first_order["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("first_orderkey").alias("sum_first_key"),
        )
    )


def q_group_distinct_violation(spark, sf):
    """G1/G2 distinct-count-per-group violation count
    (common_tests.py:41-43)."""
    ev = _t(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(F.col("n_types") != 5).alias("n_violations"),
    )


def q_group_mode(spark, sf):
    """G3 per-group majority vote, ties -> smallest value
    (common_tests.py:51, numpy argmax-over-unique semantics)."""
    from dqmtools_spark.operators.mode import group_mode

    ev = _t(spark, sf, "events")
    return group_mode(ev, ["user_id"], "event_type").withColumnRenamed(
        "event_type", "modal_event"
    )


def q_latest_per_key(spark, sf):
    """O2/O4 latest-per-key dedup (dqmtools.py:96)."""
    from dqmtools_spark.operators.latest import latest_per_key

    ev = _t(spark, sf, "events")
    return latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"]).select(
        "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
    )


def q_window_running_sum(spark, sf):
    """Window aggregation: per-user running total over event time."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


def q_topk_orders(spark, sf):
    """O1/O3 deterministic top-k (sort + limit)."""
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def q_union_append(spark, sf):
    """O5 union/concat of result slices (dqmtools.py:99-104)."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    return a.unionByName(b).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_string_funcs(spark, sf):
    """F1/F3/F4/F6 string & date scalar functions."""
    o = _t(spark, sf, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
            F.regexp_replace("o_orderpriority", r"^\d-", "").alias("prio_clean"),
            F.substring("o_orderstatus", 1, 1).alias("status_c"),
            F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio_num"),
        )
        .groupBy("month_str", "prio_clean", "status_c", "prio_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_json_regex_extract(spark, sf):
    """F5 regex capture-group parse (dqm_display.py:16,25-30)."""
    ev = _t(spark, sf, "events")
    return (
        ev.select(
            "event_type",
            F.regexp_extract("props", r'"k": (\d+)', 1).cast("long").alias("k_val"),
        )
        .groupBy("event_type")
        .agg(F.sum("k_val").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


def q_value_remap(spark, sf):
    """P8 value remapping via CASE chain (plot_utils.py:21-31)."""
    n = _t(spark, sf, "nation")
    label = (
        F.when(F.col("n_regionkey") == 0, F.lit("ZONE_A"))
        .when(F.col("n_regionkey") == 1, F.lit("ZONE_B"))
        .otherwise(F.lit("ZONE_OTHER"))
    )
    return n.select(label.alias("zone"), "n_name").groupBy("zone").agg(
        F.count(F.lit(1)).alias("n_nations")
    )


def q_prescale_sample(spark, sf):
    """P11 deterministic prescale (oracle-able modulo variant)."""
    d = _t(spark, sf, "documents")
    return d.filter(F.col("doc_id") % 7 == 0).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_events_minmax(spark, sf):
    """G7/G8/G9 distinct counts + min/max."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# §2.3 array / nested higher-order functions (embeddings)
# ---------------------------------------------------------------------------


def q_array_stats(spark, sf):
    """A1/A2/A8: per-array predicate counts and exists."""
    e = _t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(F.col("embedding"), lambda x: x > F.lit(0.25)).alias("has_big"),
        F.size("embedding").cast("long").alias("dim"),
    )


def q_array_norm(spark, sf):
    """A5/A6-style aggregate() HOF: squared L2 norm per vector."""
    e = _t(spark, sf, "embeddings")
    sq = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return e.select("vec_id", F.round(sq, 4).alias("norm_sq"))


def q_array_slice(spark, sf):
    """A7 array slice + arithmetic over the slice."""
    e = _t(spark, sf, "embeddings")
    head = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x) / F.size(head), 4
        ).alias("head_mean"),
    )


def q_cosine_knn(spark, sf):
    """Similarity search: exact cosine top-10 vs vec_id 0's embedding."""
    from dqmtools_spark.operators.similarity import cosine_topk

    e = _t(spark, sf, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = cosine_topk(e.filter(F.col("vec_id") != 0), "embedding", "vec_id", list(qvec), k=10)
    return out.select("vec_id", F.round("cosine", 4).alias("cosine"))


# ---------------------------------------------------------------------------
# documents: text analysis + dedup + quality (the graft payload in
# oracle-checkable SQL form)
# ---------------------------------------------------------------------------


def q_doc_word_stats(spark, sf):
    """Token statistics per language (ratio-of-sums, exact doubles)."""
    d = _t(spark, sf, "documents")
    wc = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        d.select("lang", wc.alias("wc"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("wc").alias("total_words"),
            (F.sum("wc").cast("double") / F.count(F.lit(1))).alias("avg_words"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_doc_stopword_fraction(spark, sf):
    """Stop-word fraction per language as ratio of integer sums."""
    d = _t(spark, sf, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    markers = F.array(*[F.lit(m) for m in ALL_MARKERS])
    hits = F.size(F.filter(toks, lambda w: F.array_contains(markers, w))).cast("long")
    return (
        d.select("lang", hits.alias("hits"), F.size(toks).cast("long").alias("wc"))
        .groupBy("lang")
        .agg(
            (F.sum("hits").cast("double") / F.sum("wc").cast("double")).alias(
                "stopword_fraction"
            )
        )
    )


def q_doc_token_count(spark, sf):
    """BPE-ish token counting per source (training-data op)."""
    d = _t(spark, sf, "documents")
    tc = F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]")).cast("long")
    return d.select("source", tc.alias("tc")).groupBy("source").agg(
        F.sum("tc").alias("total_tokens")
    )


def q_doc_exact_dedup(spark, sf):
    """Exact dedup accounting via content hash (training-data op)."""
    d = _t(spark, sf, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


def q_doc_lang_mode(spark, sf):
    """G3 applied to documents: modal lang per source."""
    from dqmtools_spark.operators.mode import group_mode

    d = _t(spark, sf, "documents")
    return group_mode(d, ["source"], "lang").withColumnRenamed("lang", "modal_lang")


def q_embedding_dup_lsh_banded(spark, sf):
    """Banded (OR-construction) integer-plane LSH near-dup pairs (new
    in round 5): 14 bands x 4 planes each — the RECALL path the
    single-band `embedding_dup_lsh` prefilter is not (~90% theoretical
    recall at cosine 0.4 vs the AND-only tier's <1%); any-band
    candidate rule + exact cosine verify, all band decisions exact
    integer math (full oracle `oracles.embedding_dup_lsh_banded_sql`)."""
    from dqmtools_spark.operators.similarity import (
        embedding_cosine_pairs_int_banded,
    )

    e = _t(spark, sf, "embeddings")
    return embedding_cosine_pairs_int_banded(
        e, "embedding", "vec_id", dim=_EMB_DIM, threshold=0.4,
        planes_per_band=4, n_bands=14, eager=True,
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_ngram_jaccard(spark, sf):
    """n-gram Jaccard near-dup scores on a bounded doc subset."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40)
    wset = F.array_distinct(F.split(F.col("text"), " "))
    s = d.select(F.col("doc_id").alias("id_a"), wset.alias("w_a"))
    t = d.select(F.col("doc_id").alias("id_b"), wset.alias("w_b"))
    inter = F.size(F.array_intersect(F.col("w_a"), F.col("w_b")))
    union = F.size(F.array_union(F.col("w_a"), F.col("w_b")))
    jac = inter.cast("double") / union
    return (
        s.join(t, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def q_dedup_clusters(spark, sf):
    """Transitive near-dup clustering: connected components over the
    n-gram-Jaccard pair graph (min-label propagation; the DuckDB
    oracle computes the same closure with a recursive CTE)."""
    from dqmtools_spark.operators.dedup import connected_components

    pairs = q_ngram_jaccard(spark, sf).select("id_a", "id_b")
    return connected_components(pairs).orderBy("id")


def q_quality_keep_summary(spark, sf):
    """The north-rule quality filter in oracle-checkable SQL form:
    C4/Gopher rules (word count, symbol ratio, per-lang stop-word
    floor) folded to keep/drop counts per language."""
    d = _t(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    low = F.split(F.lower(F.col("text")), " ")
    markers = F.array(*[F.lit(m) for m in ALL_MARKERS])
    wc = F.size(toks).cast("long")
    symbols = F.length(F.regexp_replace(F.col("text"), r"[\p{L}\p{N}\s]", ""))
    sym_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        symbols.cast("double") / F.length("text")
    )
    stop_frac = F.size(F.filter(low, lambda w: F.array_contains(markers, w))).cast(
        "double"
    ) / wc
    thr = F.when(F.col("lang") == "zh", F.lit(0.0)).otherwise(F.lit(0.05))
    keep = (wc >= 15) & (sym_ratio <= 0.08) & (stop_frac >= thr)
    return (
        d.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_keep"),
            F.count_if(~F.col("keep")).alias("n_drop"),
        )
    )


def q_doc_fingerprint(spark, sf):
    """Document fingerprinting: stable per-doc hash prefix histogram."""
    d = _t(spark, sf, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("long")
    return d.select(bucket.alias("fp_bucket")).groupBy("fp_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_pivot_matrix(spark, sf):
    """A10 vstack/pivot: per-user event-type count matrix
    (wibeth_plots.py:175,181 channel x time matrix, as groupBy+pivot)."""
    ev = _t(spark, sf, "events").filter(F.col("user_id") < 20)
    types = ["click", "view", "purchase", "login", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def q_channel_stats(spark, sf):
    """G10 per-group stats incl. exact median + sample stddev
    (the reference consumes adc_mean/adc_rms/adc_median per channel,
    wibeth_tests.py:241-242; recomputed natively here)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 3).alias("avg_value"),
        F.round(F.stddev("value"), 3).alias("std_value"),
        F.round(F.median("value"), 3).alias("median_value"),
        F.count(F.lit(1)).alias("n"),
    )


def q_cube_metrics(spark, sf):
    """Metrics cube: per-(lang, source), per-lang, per-source and grand
    totals in one pass — the rebuild's rule_metrics shape (SURVEY §2.5
    'nested suite summaries')."""
    d = _t(spark, sf, "documents")
    return d.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def q_tz_format(spark, sf):
    """F1/F2 strftime + timezone conversion (dqmtools.py:136,
    plot_utils.py:17-19: trigger_time -> Europe/Zurich)."""
    ev = _t(spark, sf, "events")
    local_ts = F.from_utc_timestamp(F.col("ts"), "Europe/Zurich")
    return (
        ev.select(
            F.date_format(local_ts, "yyyy-MM-dd HH").alias("zurich_hour"),
        )
        .groupBy("zurich_hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_record_select(spark, sf):
    """P10/O6 record selection: slice one (user)'s rows by picking the
    first key (dataframe_creator.py:168-189 select_record: default =
    first index entry, then slice all rows of that record)."""
    ev = _t(spark, sf, "events")
    first_user = ev.agg(F.min("user_id").alias("user_id"))
    return (
        ev.join(F.broadcast(first_user), on="user_id", how="left_semi")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


def q_salted_source_agg(spark, sf):
    """Skew-safe two-phase salted aggregation (north rule: salted keys
    for skewed domains).  Result is identical to a plain groupBy —
    that IS the contract the oracle checks."""
    from dqmtools_spark.operators.skew import salted_agg

    d = _t(spark, sf, "documents")
    return salted_agg(
        d,
        ["source"],
        {
            "n_docs": ("count", "*"),
            "total_chars": ("sum", "n_chars"),
            "min_id": ("min", "doc_id"),
            "max_id": ("max", "doc_id"),
        },
        unit_col="doc_id",
        n_salts=8,
    )


def q_desparsify_check(spark, sf):
    """A5 diff-of-diff sparse array reconstruction (wibeth_tests.py:191).

    Spark materializes the full array via transform/aggregate HOFs and
    reports last element + sum; the DuckDB oracle computes the same
    quantities from the closed forms — a genuine differential test of
    the reconstruction math."""
    from dqmtools_spark.functions.arrays import desparsify_diff_of_diff

    d = _t(spark, sf, "documents").select("doc_id")
    n = (F.lit(16) + F.col("doc_id") % 17).cast("int")
    first = (F.col("doc_id") * 100).cast("long")
    idx = F.array(F.lit(0).cast("long"), (F.lit(3) + F.col("doc_id") % 5).cast("long"))
    vals = F.array(
        (F.lit(2) + F.col("doc_id") % 7).cast("long"),
        (-(F.col("doc_id") % 3)).cast("long"),
    )
    arr = desparsify_diff_of_diff(first, idx, vals, n)
    return d.select(
        "doc_id",
        F.element_at(arr, -1).alias("last_val"),
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x).alias("arr_sum"),
    )


def q_cosine_dup_pairs(spark, sf):
    """Embedding-cosine near-dup, exact all-pairs tier on a bounded
    slice (LSH-bucketed variant is the rows-only `embedding_dup_lsh`)."""
    from dqmtools_spark.operators.similarity import cosine

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 150)
    l = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    r = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    c = cosine(F.col("va"), F.col("vb"))
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", c.alias("c"))
        .filter(F.col("c") >= 0.35)
        .select("id_a", "id_b", F.round("c", 4).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# LSH dedup / ANN / spectral — engine-portable tiers with FULL-output
# DuckDB oracles (discrete decisions are exact integer math; see
# dqmtools_spark/oracles.py for the matching SQL generators)
# ---------------------------------------------------------------------------

# deterministic integer hyperplanes shared by the embedding LSH queries
# (md5-derived literals; the oracle SQL embeds the same numbers)
_EMB_DIM = 64
_N_PLANES = 6


def _planes():
    from dqmtools_spark.operators.similarity import int_planes

    return int_planes(_EMB_DIM, _N_PLANES)


def q_embedding_dup_lsh(spark, sf):
    """Embedding near-dup pairs, integer-plane LSH candidates + exact
    cosine verify — bucketed self-join, oracle-reproducible."""
    from dqmtools_spark.operators.similarity import embedding_cosine_pairs_int

    e = _t(spark, sf, "embeddings")
    return embedding_cosine_pairs_int(
        e, "embedding", "vec_id", _planes(), threshold=0.35
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_minhash_pairs(spark, sf):
    """MinHash LSH near-dup pairs, md5 + Carter-Wegman family (the
    engine-portable tier; xxhash64 tier covered by pytest)."""
    from dqmtools_spark.operators.dedup import minhash_lsh_pairs_md5

    d = _t(spark, sf, "documents")
    return minhash_lsh_pairs_md5(d, "text", "doc_id", n=3, threshold=0.5, eager=True)


def q_simhash_pairs(spark, sf):
    """SimHash near-dup pairs, md5 60-bit family with n_bands=7 >
    max_hamming=6 — pigeonhole recall exactly 1.0, so the output IS
    'all pairs with Hamming <= 6' and the oracle checks that directly."""
    from dqmtools_spark.functions.hashing import md5_hash60
    from dqmtools_spark.operators.dedup import simhash_pairs

    d = _t(spark, sf, "documents")
    return simhash_pairs(
        d, "text", "doc_id", max_hamming=6, n_bits=60, token_hash=md5_hash60,
        eager=True,
    )


def q_ann_topk(spark, sf):
    """ANN top-k over the integer-plane LSH index; probe = query bucket
    + all Hamming-1 buckets (data-independent multiprobe rule)."""
    from dqmtools_spark.operators.similarity import (
        build_int_ann_index,
        int_ann_query,
    )

    e = _t(spark, sf, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    indexed = build_int_ann_index(
        e.filter(F.col("vec_id") != 0), "embedding", _planes()
    )
    return int_ann_query(
        indexed, "embedding", "vec_id", qvec, _planes(), k=10
    ).select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_ivf_topk(spark, sf):
    """IVF ANN, quantized inner-product tier: md5-sampled centroids,
    exact int-dot assignment, probe-pruned scan (3 of 8 clusters).
    The float k-means tier (build_ivf_index) is pytest-gated."""
    from dqmtools_spark.operators.similarity import (
        build_ivf_ip_index,
        ivf_ip_query,
    )

    e = _t(spark, sf, "embeddings")
    qvec = list(e.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    indexed, centroids = build_ivf_ip_index(
        e.filter(F.col("vec_id") != 0), "embedding", "vec_id", n_centroids=8
    )
    return ivf_ip_query(
        indexed, centroids, "embedding", "vec_id", qvec, k=10, n_probe=3
    ).select("vec_id", F.round("cosine", 4).alias("cosine"))


def q_doc_line_dedup(spark, sf):
    """Intra-document boilerplate removal: drop repeated lines (keep
    first occurrence), report per-doc line counts and the md5 of the
    reconstructed text — a full byte-level differential of the
    transform (the md5 matches only if the kept-line SET, ORDER and
    JOINING are all identical)."""
    from dqmtools_spark.functions.textstats import dedup_repeated_lines, lines

    d = _t(spark, sf, "documents")
    deduped = dedup_repeated_lines(F.col("text"))
    return d.select(
        "doc_id",
        F.size(lines(F.col("text"))).cast("long").alias("n_lines"),
        # keep-first retains exactly one element per distinct line
        F.size(F.array_distinct(lines(F.col("text")))).cast("long").alias("n_kept"),
        F.md5(deduped).alias("dedup_md5"),
    )


def q_doc_global_line_dedup(spark, sf):
    """C4-style corpus-GLOBAL line dedup: every line survives only at
    its first (doc_id, idx) occurrence across the whole corpus.  The
    documents table has no newlines, so both engines first derive the
    same deterministic multi-line form (4-word chunks; ~430 cross-doc
    duplicate lines exist at sf0.01).  Byte-level md5 differential of
    each reassembled document."""
    from dqmtools_spark.operators.dedup import global_line_dedup, word_chunks

    d = _t(spark, sf, "documents")
    pages = d.select(
        "doc_id", F.array_join(word_chunks(F.col("text")), "\n").alias("text")
    )
    out = global_line_dedup(pages, "text", "doc_id")
    return out.select("doc_id", "n_kept", F.md5("deduped_text").alias("dedup_md5"))


def q_token_shards(spark, sf):
    """Training-shard packing: deterministic greedy ~2000-token shards
    over doc_id order; per-shard packing report."""
    from dqmtools_spark.functions.textstats import token_count_bpe_ish
    from dqmtools_spark.operators.sharding import assign_token_shards, shard_summary

    d = _t(spark, sf, "documents")
    sharded = assign_token_shards(
        d, token_count_bpe_ish(F.col("text")), ["doc_id"], budget=2000
    )
    return shard_summary(sharded)


def q_dup_ngram_spans(spark, sf):
    """ExactSubstr-style repeated-span signal (new in round 4): per
    doc, the fraction of 5-word-gram positions whose gram occurs in
    >= 2 distinct docs corpus-wide — md5-family hashes, full oracle
    (`oracles.dup_ngram_spans_sql`)."""
    from dqmtools_spark.operators.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(
        _t(spark, sf, "documents"), "text", "doc_id", n=5, min_docs=2,
        eager=True,
    )


def q_remove_dup_spans(spark, sf):
    """ExactSubstr-style repeated-span REMOVAL (new in round 4): drop
    every token covered by a corpus-hot 5-gram and rebuild the text;
    docs without dup spans pass through map-side (semi-join routing) —
    full oracle (`oracles.remove_dup_spans_sql`)."""
    from dqmtools_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(
        _t(spark, sf, "documents"), "text", "doc_id", n=5, min_docs=2,
        eager=True,
    )


def q_remove_dup_spans_max(spark, sf):
    """MAXIMAL-span removal (new in round 5): adjacent hot-gram
    positions merge into maximal spans (gaps-and-islands) and only
    spans >= 40 rejoined chars are removed — the actual Lee et al.
    2022 minimum-length rule, so two short scattered 5-grams no longer
    count while a boilerplate run does.  Full oracle
    (`oracles.remove_dup_spans_max_sql`)."""
    from dqmtools_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(
        _t(spark, sf, "documents"), "text", "doc_id", n=5, min_docs=2,
        min_span_chars=40, eager=True,
    )


def q_contamination(spark, sf):
    """Benchmark decontamination: corpus docs sharing an 8-word-gram
    with the 'eval set' (doc_id < 20), with distinct-gram counts —
    broadcast semi-join plan, md5-family hashes (full oracle)."""
    from dqmtools_spark.operators.decontam import contamination_flags

    d = _t(spark, sf, "documents")
    return contamination_flags(
        d.filter(F.col("doc_id") >= 20),
        d.filter(F.col("doc_id") < 20),
        "text",
        "doc_id",
        n=8,
    )


def q_asof_latest_click(spark, sf):
    """As-of join (time-series lookup Spark lacks as a primitive): for
    every 'error' event, the latest 'click' by the same user at or
    before it, with the exact integer gap in microseconds.  Spark side
    is the union+ordered-window construction (operators/asof.py, one
    shuffle); the oracle is DuckDB's NATIVE ``ASOF LEFT JOIN`` — a
    fully independent implementation of the same semantics."""
    from dqmtools_spark.operators.asof import asof_join
    from dqmtools_spark.operators.sessions import epoch_micros_fn

    ev = _t(spark, sf, "events")
    micros = epoch_micros_fn(ev, "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(errs, clicks, on="user_id", left_ts="ts", right_ts="ts",
                  payload_prefix="m_")
    return j.select(
        "event_id",
        "user_id",
        F.col("m_click_event_id").alias("click_event_id"),
        (micros(F.col("ts")) - micros(F.col("m_ts"))).alias("gap_us"),
    )


def q_event_sessions(spark, sf):
    """Gap-based sessionization (12h inactivity threshold) of the
    events stream: one row per (user, session) with event count and
    exact integer duration — lag + running-sum windows sharing one
    sort, integer-microsecond boundary decisions."""
    from dqmtools_spark.operators.sessions import session_summary

    ev = _t(spark, sf, "events")
    out = session_summary(ev, "user_id", "ts", gap_minutes=720,
                          tiebreak="event_id")
    return out.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        "duration_us",
    )


def q_url_canon_dedup(spark, sf):
    """CommonCrawl-style canonical-URL dedup: five deterministic messy
    variants (case, www, default port, tracking params, fragment,
    trailing slash) are derived per doc and collapsed by
    ``canonical_url`` (pure codegen regexp/string expressions); output
    is one row per canonical URL with the collision count.  The oracle
    re-renders the same normalization in DuckDB's RE2 engine
    (``canonical_url_sql``) — a cross-regex-engine differential."""
    from dqmtools_spark.functions.urls import canonical_url

    d = _t(spark, sf, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    pid = (F.col("doc_id") % 40).cast("string")
    path = F.concat(F.lit("/p/"), pid)
    v = F.col("doc_id") % 5
    messy = (
        F.when(v == 0, F.concat(F.lit("https://"), host, path))
        .when(v == 1, F.concat(F.lit("HTTPS://WWW."), F.upper(host), path,
                               F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://"), host, F.lit(":443"), path,
                               F.lit("?utm_source=feed&utm_medium=rss")))
        .when(v == 3, F.concat(F.lit("http://"), host, F.lit(":80"), path,
                               F.lit("?id="), pid,
                               F.lit("&utm_campaign=x#sec2")))
        .otherwise(F.concat(F.lit("https://www."), host, path,
                            F.lit("?fbclid=abc&page=2")))
    )
    return (
        d.select(F.col("doc_id"), canonical_url(messy).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def q_doc_dup_line_fraction(spark, sf):
    """Gopher duplicate-line signals per document over the same
    deterministic 4-word-chunk line form as doc_global_line_dedup:
    multiplicity counts + exact-single-division fractions, two
    map-side-combinable aggregates (no per-doc sort)."""
    from dqmtools_spark.operators.dedup import word_chunks
    from dqmtools_spark.operators.repetition import dup_line_stats

    d = _t(spark, sf, "documents")
    return dup_line_stats(
        d.select("doc_id", word_chunks(F.col("text")).alias("_chunks")),
        F.col("_chunks"),
        "doc_id",
    )


def q_stratified_sample(spark, sf):
    """Deterministic exactly-K-per-stratum sample (K=20 docs per
    language) by portable md5 rank — reproducible across cluster sizes
    and partitionings, unlike df.sample/sampleBy."""
    from dqmtools_spark.operators.sampling import stratified_hash_sample

    d = _t(spark, sf, "documents")
    s = stratified_hash_sample(d, ["lang"], "doc_id", k=20)
    return s.select(
        "lang", "doc_id", F.col("sample_rank").cast("long").alias("sample_rank")
    )


def q_bloom_dedup(spark, sf):
    """Bloom-filter membership of a probe batch (doc_id < 50) against
    the corpus (doc_id >= 50): 1024-bit filter, k=5 (sized small so
    the false-positive path is exercised at sf0.01), plus the
    exact-join ground truth column — the differential itself proves
    the no-false-negative law on every row."""
    from dqmtools_spark.operators.bloom import bloom_build, bloom_probe

    d = _t(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") >= 50).select("text")
    probe = d.filter(F.col("doc_id") < 50).select("doc_id", "text")
    words = bloom_build(corpus, "text", m_bits=1024, k=5)
    memb = bloom_probe(probe, words, "text", "doc_id", m_bits=1024, k=5)
    cd = corpus.distinct().withColumn("_in", F.lit(True))
    actual = probe.join(cd, "text", "left").select(
        "doc_id", F.coalesce("_in", F.lit(False)).alias("actual_dup")
    )
    return memb.join(actual, "doc_id")


def q_group_quantiles(spark, sf):
    """Exact distributed quantiles (G-family gap): per-group p25/50/75
    of l_quantity via Spark's exact percentile aggregate; DuckDB's
    quantile_cont is the independent implementation (both interpolate
    linearly at rank (n-1)p; the probed quantities are integral and the
    probe points are exact binary fractions, so the interpolated
    doubles are bit-identical)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q1"),
        F.percentile("l_quantity", 0.5).alias("median"),
        F.percentile("l_quantity", 0.75).alias("q3"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_inverted_index(spark, sf):
    """Search-index build primitive: bigram -> sorted posting list of
    the documents containing it (distinct grams per doc, so df ==
    posting length), common-gram cutoff df >= 5.  ONE exchange on the
    gram after a map-side-combinable partial aggregate; postings are
    emitted as a CSV string (the repo's no-array-output oracle
    precedent — engines disagree on array rendering, not content).
    At corpus scale a stop-gram's posting row grows O(docs):
    production indexes cap or range-bucket postings per gram (a
    (gram, shard) two-level key, same pattern as operators/sharding);
    the single-row form here is the oracle-able core."""
    from dqmtools_spark.operators.dedup import word_shingles

    d = _t(spark, sf, "documents")
    grams = word_shingles(F.col("text"), 2, strict=True, distinct=True)
    ex = d.select("doc_id", F.explode(grams).alias("gram"))
    return (
        ex.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            ),
        )
        .filter(F.col("df") >= 5)
    )


def q_fuzzy_prefix_pairs(spark, sf):
    """Blocked fuzzy matching: same-first-word documents whose 40-char
    prefixes are within edit distance 18 — exact integer Levenshtein,
    candidates confined to first-token blocks (the LSH-tier
    discipline: equi-join on the block, never cartesian; Spark's
    thresholded levenshtein prunes the DP, DuckDB's plain one is the
    independent implementation).  Keys are restricted to ASCII
    prefixes on both sides: Spark edits codepoints, DuckDB bytes, and
    the two agree exactly on ASCII (see operators/fuzzy.py)."""
    from dqmtools_spark.operators.fuzzy import blocked_levenshtein_pairs

    d = _t(spark, sf, "documents").filter(
        F.col("text").isNotNull()
        & F.substring(F.col("text"), 1, 40).rlike(r"^\p{ASCII}*$")
    )
    words = F.split(F.col("text"), " ")
    return blocked_levenshtein_pairs(
        d,
        key=F.substring(F.col("text"), 1, 40),
        block=words.getItem(0),
        id_col="doc_id",
        max_dist=18,
    )


def q_cms_user_counts(spark, sf):
    """Count-min sketch frequency estimation (heavy-hitter primitive):
    a deliberately tight 64x4 sketch over all events, estimates joined
    against the exact per-user counts — `over_by` exposes the
    collision overestimate, and the sketch's never-undercount law is
    checkable row-by-row in the differential itself.  Build shuffles
    at most d·w counter rows regardless of input size."""
    from dqmtools_spark.operators.sketch import cms_build, cms_estimate

    ev = _t(spark, sf, "events")
    keyexpr = F.col("user_id").cast("string")
    sketch = cms_build(ev, keyexpr, width=64, depth=4)
    keys = ev.select(keyexpr.alias("ukey")).distinct()
    est = cms_estimate(keys, sketch, "ukey", width=64, depth=4)
    exact = ev.groupBy(keyexpr.alias("ukey")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return est.join(exact, "ukey").select(
        F.col("ukey").cast("long").alias("user_id"),
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("over_by"),
    )


def q_hll_distinct(spark, sf):
    """HyperLogLog distinct-count estimation (m=32) next to the exact
    countDistinct — registers and ranks are pure integer math and the
    harmonic sum is an exact dyadic integer, so the DuckDB oracle
    replays the sketch bit-for-bit; the raw-estimator bias at small
    cardinality is visible (and identical) on both sides."""
    from dqmtools_spark.operators.sketch import hll_estimate, hll_registers

    ev = _t(spark, sf, "events")
    regs = hll_registers(ev, F.col("user_id").cast("string"), m=32)
    est = hll_estimate(regs, m=32)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_n"))
    return est.crossJoin(exact).select(
        "exact_n", F.round("hll_raw", 2).alias("hll_est")
    )


def q_unpivot_metrics(spark, sf):
    """Wide -> long unpivot (the inverse of pivot_matrix): per-nation
    aggregates melted into (nation, metric, value) rows — Spark
    ``unpivot`` vs DuckDB ``UNPIVOT``, independent implementations of
    the same relational op.  Values are decimal-summed then rounded,
    same money policy as everywhere."""
    n = _t(spark, sf, "nation")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    wide = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["total_price", "n_orders", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_window_rank_suite(spark, sf):
    """Ranking-window completion (O-family): rank, dense_rank, ntile,
    percent_rank and cume_dist over per-nation customer balances —
    every emitted value is an exact rational of small integers
    (percent_rank = (rank-1)/(n-1), cume_dist = rank/n), so the
    cross-engine comparison is exact without rounding."""
    from pyspark.sql import Window

    c = _t(spark, sf, "customer").filter(F.col("c_custkey") % 10 == 0)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_robust_stats(spark, sf):
    """Robust statistics (outlier-resistant profiling): per-group
    median absolute deviation of l_quantity — two exact percentile
    passes (median, then median of |x - median|).  Quantities are
    integral and medians land on .0/.5, so every deviation is an exact
    dyadic double; both engines interpolate at rank (n-1)/2."""
    li = _t(spark, sf, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "med", F.abs(F.col("l_quantity") - F.col("med")).alias("_d")
    )
    return dev.groupBy("l_returnflag").agg(
        F.first("med").alias("median_qty"),
        F.percentile("_d", 0.5).alias("mad_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_histogram_totalprice(spark, sf):
    """Fixed-width histogram of order totals (data-profiling
    primitive): bin = floor(price / 25000) — one IEEE division + floor
    with the identical expression shape on both engines, then a
    map-side-combinable count per bin."""
    o = _t(spark, sf, "orders")
    b = F.floor(F.col("o_totalprice") / 25000).cast("long")
    return (
        o.select(b.alias("bin"), "o_totalprice")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


def q_range_interval_join(spark, sf):
    """Interval-point range join, bucketized (operators/ranges.py):
    purchases within 24h of the same user's signup.  The Spark side is
    the scalable bucket equi-join + exact filter; the oracle is
    DuckDB's plain BETWEEN range predicate — two deliberately
    different implementations of the same semantics."""
    from dqmtools_spark.operators.ranges import interval_point_join
    from dqmtools_spark.operators.sessions import epoch_micros_fn

    ev = _t(spark, sf, "events")
    micros = epoch_micros_fn(ev, "ts")
    sign = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("win_end"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = interval_point_join(
        sign, purch, "user_id", "win_start", "win_end", "ts",
        bucket_minutes=1440,
    )
    return out.select(
        "signup_id",
        "purchase_id",
        "user_id",
        (micros(F.col("ts")) - micros(F.col("win_start"))).alias("lag_us"),
    )


def q_time_bucket_rollup(spark, sf):
    """Hypertable-style continuous-aggregate shape: day-bucketed
    metrics ROLLUPed through (day, event_type) -> (day) -> grand
    total, one pass (`rollup` grouping sets).  The day bucket is
    date_trunc (calendar-exact, no float); money sums ride the
    decimal policy; grouping_id disambiguates levels identically in
    both engines."""
    ev = _t(spark, sf, "events")
    day = F.date_trunc("DAY", F.col("ts")).alias("day")
    return (
        ev.select(day, "event_type", "value")
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
            F.grouping_id().cast("long").alias("level"),
        )
    )


def q_set_ops(spark, sf):
    """Relational set operations (the O-family gap): customers who
    ordered in BOTH 1995 and 1996 (INTERSECT DISTINCT) minus anyone
    with a sub-5000 order (EXCEPT DISTINCT) — Spark intersect/subtract
    vs DuckDB INTERSECT/EXCEPT, independent implementations."""
    o = _t(spark, sf, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    low = o.filter(F.col("o_totalprice") < 5000).select("o_custkey")
    return y95.intersect(y96).subtract(low)


def q_doc_top_bigram(spark, sf):
    """Gopher repetition signal: per-document most-common word bigram
    and the character fraction it covers, aggregated per source (avg
    is exact: ratio-of-exact-doubles rounded at the end)."""
    from dqmtools_spark.operators.repetition import top_ngram_stats

    d = _t(spark, sf, "documents")
    per_doc = top_ngram_stats(d, "text", "doc_id", n=2)
    joined = per_doc.join(d.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("char_fraction"), 4).alias("avg_top_bigram_fraction"),
        F.max("top_count").alias("max_top_count"),
    )


def q_spectral_peak(spark, sf):
    """F9 spectral analysis: vectorized FFT power spectrum (Arrow-batch
    2-D rfft) over a synthesized two-tone signal, peak extracted with
    JVM array expressions; the oracle is the closed-form DFT."""
    from dqmtools_spark.functions.spectral import (
        power_spectrum_udf,
        spectral_peak,
        synth_tone,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    freq = F.lit(1) + F.col("doc_id") % 14
    sig = synth_tone(freq, n=32, second_freq=15, second_amp=0.25)
    ps = d.withColumn("_ps", power_spectrum_udf(sig))
    peak_bin, peak_power = spectral_peak(F.col("_ps"))
    return ps.select(
        "doc_id",
        peak_bin.alias("peak_bin"),
        F.round(peak_power, 3).alias("peak_power"),
    )


def q_pipeline_full(spark, sf):
    """Full pages pipeline (UDF path) over documents-as-pages."""
    from dqmtools_spark.pipeline import run_pipeline

    docs = _t(spark, sf, "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    result, _ = run_pipeline(spark, pages, n_buckets=16)
    return result.select("url", "keep", "lang_pred", "quality_score")


def _staged_ckpt_dir(sf: str) -> str:
    """Session-reusable phase-1 checkpoint location for the staged
    pipeline query: keyed by the input table's identity (path + mtime +
    size), so repeated driver/pytest invocations over the SAME testdata
    skip the Python phase entirely (``_SUCCESS`` short-circuit in
    ``run_pipeline_staged``), while a regenerated testdata dir gets a
    fresh key.  A per-call ``tempfile.mkdtemp`` (the r2 form) re-ran
    phase 1 every time — the slowest part of the slowest query."""
    import hashlib
    import os

    doc = os.path.join(sf, "documents.parquet")
    try:
        st = os.stat(doc)
        key = f"{doc}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        key = doc
    h = hashlib.md5(key.encode()).hexdigest()[:12]
    return os.path.join("/tmp/dqmtools_staged_ckpt", h, "text_checkpoint")


def q_pipeline_staged_agg(spark, sf):
    """STAGED pipeline (phase-1 checkpoint materialized to parquet,
    phase 2 reads it back — the reference's write-then-analyze flow),
    folded to keep counts per predicted language.  Shares its oracle
    CTE with pipeline_full, proving fused and staged paths agree under
    the driver's own gate."""
    from dqmtools_spark.pipeline import run_pipeline_staged

    docs = _t(spark, sf, "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    result, _ = run_pipeline_staged(spark, pages, _staged_ckpt_dir(sf), n_buckets=16)
    return (
        result.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_keep"),
            F.count_if(~F.col("keep")).alias("n_drop"),
        )
    )


def q_float_lsh_invariant(spark, sf):
    """Driver-checkable invariants for the FLOAT-tier ANN/dedup paths
    (``hyperplane_bucket_udf`` LSH + k-means IVF), whose emitted pair
    sets are not bit-reproducible in SQL (float matmul ordering).  The
    oracle states each invariant's REQUIRED value as a constant; Spark
    computes the ACTUAL value from the float-tier outputs joined back
    to the raw parquet vectors — any float-tier regression flips a
    value and the driver's hash compare goes red:

    - ``n_false_pos``: float-LSH pairs whose exact cosine (recomputed
      independently from the parquet vectors, not read from the pair
      frame) is below threshold -> must be 0 (verify stage = precision
      1.0).
    - ``recall_ge_int_tier``: the 4-plane float tier must emit at
      least as many verified pairs as the 6-plane integer tier on the
      same input and threshold (coarser buckets => larger candidate
      coverage) -> must be 1.
    - ``ivf_topk_in_exact_top50``: every id in the float k-means IVF
      top-10 (n_probe=4 of 8) appears in the exact brute-force top-50
      -> must be 1.  Deterministic: k-means init/iters are seeded
      hash-sample + argmax, no RNG.
    """
    from dqmtools_spark.operators.dedup import embedding_cosine_pairs
    from dqmtools_spark.operators.similarity import (
        build_ivf_index,
        cosine,
        cosine_topk,
        embedding_cosine_pairs_int,
        ivf_query,
    )

    e = _t(spark, sf, "embeddings")
    thr = 0.35
    fpairs = embedding_cosine_pairs(
        e, "embedding", "vec_id", dim=_EMB_DIM, threshold=thr, n_planes=4, seed=42
    )
    va = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("_va"),
    )
    vb = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("_vb"),
    )
    stats = (
        fpairs.join(va, "id_a")
        .join(vb, "id_b")
        .agg(
            F.count_if(cosine(F.col("_va"), F.col("_vb")) < F.lit(thr)).alias("bad"),
            F.count(F.lit(1)).alias("n_float"),
        )
        .collect()[0]
    )
    n_int = embedding_cosine_pairs_int(
        e, "embedding", "vec_id", _planes(), threshold=thr
    ).count()

    rest = e.filter(F.col("vec_id") != 0)
    qvec = list(e.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    indexed, centroids = build_ivf_index(
        rest, "embedding", "vec_id", n_centroids=8
    )
    ivf_ids = {
        r["vec_id"]
        for r in ivf_query(
            indexed, centroids, "embedding", "vec_id", qvec, k=10, n_probe=4
        ).collect()
    }
    exact50 = {
        r["vec_id"] for r in cosine_topk(rest, "embedding", "vec_id", qvec, k=50).collect()
    }
    return spark.range(1).select(
        F.lit(int(stats["bad"])).cast("long").alias("n_false_pos"),
        F.lit(1 if int(stats["n_float"]) >= n_int else 0)
        .cast("long")
        .alias("recall_ge_int_tier"),
        F.lit(1 if ivf_ids <= exact50 else 0)
        .cast("long")
        .alias("ivf_topk_in_exact_top50"),
    )


# ---------------------------------------------------------------------------


def _url_canon_oracle_sql() -> str:
    """DuckDB side of q_url_canon_dedup: the same five messy-URL
    variants, normalized by the RE2 rendering of canonical_url."""
    from dqmtools_spark.functions.urls import canonical_url_sql

    return f"""
        WITH b AS (
            SELECT doc_id,
                   source || '.example.com' AS host,
                   CAST(doc_id % 40 AS VARCHAR) AS pid
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CASE doc_id % 5
                     WHEN 0 THEN 'https://' || host || '/p/' || pid
                     WHEN 1 THEN 'HTTPS://WWW.' || UPPER(host)
                                 || '/p/' || pid || '/'
                     WHEN 2 THEN 'https://' || host || ':443/p/' || pid
                                 || '?utm_source=feed&utm_medium=rss'
                     WHEN 3 THEN 'http://' || host || ':80/p/' || pid
                                 || '?id=' || pid || '&utm_campaign=x#sec2'
                     ELSE 'https://www.' || host || '/p/' || pid
                                 || '?fbclid=abc&page=2'
                   END AS messy
            FROM b
        )
        SELECT canon_url, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
        FROM (SELECT doc_id, {canonical_url_sql('messy')} AS canon_url
              FROM m)
        GROUP BY canon_url
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver executes entries in dict order and caps
    # each round at 50 queries.  Staleness rotation: queries whose most
    # recent DRIVER row is oldest run FIRST.  Round-5 ordering:
    #   block 1 — NEW in round 5, never driver-verified (always first);
    #   block 2 — the 25 whose driver rows date from r3 (rotated out of
    #             r4 by the 50-query cap) — VERDICT r4 "Next round"
    #             item 2;
    #   block 3 — r4-green queries whose backing modules
    #             (operators/dedup.py, operators/similarity.py) took
    #             r5 diffs — re-prove;
    #   block 4 — green in CORRECTNESS_r04.json on unchanged modules
    #             (freshest signal, safe to rotate past the cap).
    return {
        # ---- block 1: NEW in round 5, never driver-verified
        "remove_dup_spans_max": q_remove_dup_spans_max,
        "embedding_dup_lsh_banded": q_embedding_dup_lsh_banded,
        # ---- block 2: r3-vintage driver signal, re-prove on current code
        "filter_sql_string": q_filter_sql_string,
        "project_compute": q_project_compute,
        "broadcast_dim_join": q_broadcast_dim_join,
        "multi_join_agg": q_multi_join_agg,
        "semi_join_exists": q_semi_join_exists,
        "anti_join_resume": q_anti_join_resume,
        "dedup_then_join": q_dedup_then_join,
        "group_distinct_violation": q_group_distinct_violation,
        "group_mode": q_group_mode,
        "latest_per_key": q_latest_per_key,
        "window_running_sum": q_window_running_sum,
        "topk_orders": q_topk_orders,
        "union_append": q_union_append,
        "string_funcs": q_string_funcs,
        "json_regex_extract": q_json_regex_extract,
        "value_remap": q_value_remap,
        "prescale_sample": q_prescale_sample,
        "events_minmax": q_events_minmax,
        "array_stats": q_array_stats,
        "array_norm": q_array_norm,
        "array_slice": q_array_slice,
        "cosine_knn": q_cosine_knn,
        "doc_word_stats": q_doc_word_stats,
        "doc_stopword_fraction": q_doc_stopword_fraction,
        "doc_token_count": q_doc_token_count,
        # ---- block 3: r4-green, but dedup.py / similarity.py took r5 diffs
        "dup_ngram_spans": q_dup_ngram_spans,
        "remove_dup_spans": q_remove_dup_spans,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "doc_global_line_dedup": q_doc_global_line_dedup,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_dup_lsh": q_embedding_dup_lsh,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        "float_lsh_invariant": q_float_lsh_invariant,
        # ---- block 4: green in CORRECTNESS_r04.json, modules unchanged
        "quality_keep_summary": q_quality_keep_summary,
        "pipeline_full": q_pipeline_full,
        "pipeline_staged_agg": q_pipeline_staged_agg,
        "spectral_peak": q_spectral_peak,
        "doc_line_dedup": q_doc_line_dedup,
        "token_shards": q_token_shards,
        "contamination": q_contamination,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_lang_mode": q_doc_lang_mode,
        "ngram_jaccard": q_ngram_jaccard,
        "doc_fingerprint": q_doc_fingerprint,
        "pivot_matrix": q_pivot_matrix,
        "channel_stats": q_channel_stats,
        "cube_metrics": q_cube_metrics,
        "tz_format": q_tz_format,
        "record_select": q_record_select,
        "salted_source_agg": q_salted_source_agg,
        "desparsify_check": q_desparsify_check,
        "doc_top_bigram": q_doc_top_bigram,
        "asof_latest_click": q_asof_latest_click,
        "event_sessions": q_event_sessions,
        "url_canon_dedup": q_url_canon_dedup,
        "doc_dup_line_fraction": q_doc_dup_line_fraction,
        "stratified_sample": q_stratified_sample,
        "bloom_dedup": q_bloom_dedup,
        "group_quantiles": q_group_quantiles,
        "inverted_index": q_inverted_index,
        "fuzzy_prefix_pairs": q_fuzzy_prefix_pairs,
        "cms_user_counts": q_cms_user_counts,
        "hll_distinct": q_hll_distinct,
        "unpivot_metrics": q_unpivot_metrics,
        "window_rank_suite": q_window_rank_suite,
        "robust_stats": q_robust_stats,
        "histogram_totalprice": q_histogram_totalprice,
        "range_interval_join": q_range_interval_join,
        "time_bucket_rollup": q_time_bucket_rollup,
        "set_ops": q_set_ops,
        "pricing_summary": q_pricing_summary,
        "filter_compound": q_filter_compound,
    }


def oracle_sql() -> dict[str, str]:
    from dqmtools_spark import oracles
    from dqmtools_spark.operators.similarity import int_planes

    planes = int_planes(_EMB_DIM, _N_PLANES)
    return {
        # engine-portable tiers: generated SQL mirrors the Spark plan's
        # integer decisions bit-for-bit (dqmtools_spark/oracles.py)
        "minhash_pairs": oracles.minhash_pairs_sql(
            n=3, num_hashes=32, bands=8, threshold=0.5
        ),
        "simhash_pairs": oracles.simhash_pairs_sql(max_hamming=6, n_bits=60),
        "embedding_dup_lsh": oracles.embedding_dup_lsh_sql(planes, threshold=0.35),
        "embedding_dup_lsh_banded": oracles.embedding_dup_lsh_banded_sql(
            [int_planes(_EMB_DIM, 4, tag=f"band{i}") for i in range(14)],
            threshold=0.4,
        ),
        "ann_topk": oracles.ann_topk_sql(planes, k=10),
        "ivf_topk": oracles.ivf_topk_sql(n_centroids=8, n_probe=3, k=10),
        "spectral_peak": oracles.spectral_peak_sql(n=32, max_freq=14),
        "doc_line_dedup": oracles.doc_line_dedup_sql(),
        "doc_global_line_dedup": oracles.global_line_dedup_sql(chunk=4, min_chars=1),
        "token_shards": oracles.token_shards_sql(budget=2000),
        "contamination": oracles.contamination_sql(n=8, eval_max_id=20),
        "dup_ngram_spans": oracles.dup_ngram_spans_sql(n=5, min_docs=2),
        "remove_dup_spans": oracles.remove_dup_spans_sql(n=5, min_docs=2),
        "remove_dup_spans_max": oracles.remove_dup_spans_max_sql(
            n=5, min_docs=2, min_span_chars=40
        ),
        "doc_top_bigram": oracles.doc_top_bigram_sql(),
        "pipeline_full": oracles.pipeline_result_sql(),
        "pipeline_staged_agg": oracles.pipeline_keep_agg_sql(),
        # invariant oracle: the float tiers' DISCRETE decisions are not
        # SQL-portable, so the oracle pins the invariants' required
        # values; the Spark side computes the actual ones (see
        # q_float_lsh_invariant) — a float-tier regression mismatches
        "float_lsh_invariant": """
            SELECT CAST(0 AS BIGINT) AS n_false_pos,
                   CAST(1 AS BIGINT) AS recall_ge_int_tier,
                   CAST(1 AS BIGINT) AS ivf_topk_in_exact_top50
        """,
        "asof_latest_click": """
            WITH clicks AS (
                SELECT user_id, ts, MAX(event_id) AS click_event_id
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts
            ),
            errs AS (
                SELECT event_id, user_id, ts
                FROM events WHERE event_type = 'error'
            )
            SELECT e.event_id, e.user_id, c.click_event_id,
                   epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
            FROM errs e ASOF LEFT JOIN clicks c
              ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "event_sessions": """
            WITH g AS (
                SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)
                           AS gap
                FROM events
            ),
            s AS (
                SELECT user_id, tus,
                       CAST(SUM(CASE WHEN gap IS NULL
                                      OR gap > 43200000000
                                     THEN 1 ELSE 0 END) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_seq
                FROM g
            )
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   MAX(tus) - MIN(tus) AS duration_us
            FROM s GROUP BY user_id, session_seq
        """,
        "url_canon_dedup": _url_canon_oracle_sql(),
        "bloom_dedup": oracles.bloom_dedup_sql(m_bits=1024, k=5, split_id=50),
        "cms_user_counts": oracles.cms_user_counts_sql(width=64, depth=4),
        "hll_distinct": oracles.hll_users_sql(m=32),
        "unpivot_metrics": """
            WITH wide AS (
                SELECT n.n_name,
                       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
                            AS DOUBLE) AS total_price,
                       CAST(COUNT(*) AS DOUBLE) AS n_orders,
                       CAST(COUNT(DISTINCT o.o_custkey) AS DOUBLE)
                           AS n_customers
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY n.n_name
            )
            SELECT n_name, metric, value
            FROM wide
            UNPIVOT (value FOR metric IN (total_price, n_orders,
                                          n_customers))
        """,
        "set_ops": """
            SELECT o_custkey FROM (
                SELECT o_custkey FROM orders
                WHERE year(o_orderdate) = 1995
                INTERSECT
                SELECT o_custkey FROM orders
                WHERE year(o_orderdate) = 1996
            )
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_totalprice < 5000
        """,
        "time_bucket_rollup": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                       AS total_value,
                   CAST(GROUPING(date_trunc('day', ts)) * 2
                        + GROUPING(event_type) AS BIGINT) AS level
            FROM events
            GROUP BY ROLLUP (date_trunc('day', ts), event_type)
        """,
        "range_interval_join": """
            WITH s AS (
                SELECT event_id AS signup_id, user_id,
                       ts AS ws, ts + INTERVAL 24 HOUR AS we
                FROM events WHERE event_type = 'signup'
            ),
            p AS (
                SELECT event_id AS purchase_id, user_id, ts
                FROM events WHERE event_type = 'purchase'
            )
            SELECT s.signup_id, p.purchase_id, s.user_id,
                   epoch_us(p.ts) - epoch_us(s.ws) AS lag_us
            FROM s JOIN p
              ON s.user_id = p.user_id
             AND p.ts BETWEEN s.ws AND s.we
        """,
        "robust_stats": """
            WITH med AS (
                SELECT l_returnflag,
                       quantile_cont(l_quantity, 0.5) AS med
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT li.l_returnflag,
                   MIN(med.med) AS median_qty,
                   quantile_cont(ABS(li.l_quantity - med.med), 0.5)
                       AS mad_qty,
                   COUNT(*) AS n_rows
            FROM lineitem li JOIN med ON li.l_returnflag = med.l_returnflag
            GROUP BY li.l_returnflag
        """,
        "histogram_totalprice": """
            SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
                   COUNT(*) AS n_orders,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price
            FROM orders
            GROUP BY CAST(FLOOR(o_totalprice / 25000) AS BIGINT)
        """,
        "window_rank_suite": """
            SELECT c_custkey, c_nationkey,
                   CAST(RANK() OVER w AS BIGINT) AS rnk,
                   CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
                   CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
                   PERCENT_RANK() OVER w AS pct_rank,
                   CUME_DIST() OVER w AS cume
            FROM customer
            WHERE c_custkey % 10 = 0
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal ASC, c_custkey ASC)
        """,
        "fuzzy_prefix_pairs": """
            WITH p AS (
                SELECT doc_id,
                       SUBSTRING(text, 1, 40) AS pre,
                       STRING_SPLIT(text, ' ')[1] AS blk
                FROM documents
                WHERE text IS NOT NULL
                  AND regexp_matches(SUBSTRING(text, 1, 40),
                                     '^[[:ascii:]]*$')
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.pre, b.pre) AS INTEGER) AS dist
            FROM p a JOIN p b
              ON a.blk = b.blk AND a.doc_id < b.doc_id
            WHERE levenshtein(a.pre, b.pre) <= 18
        """,
        "inverted_index": r"""
            WITH w AS (
                SELECT doc_id,
                       REGEXP_EXTRACT_ALL(TRIM(text), '\S+') AS words
                FROM documents WHERE text IS NOT NULL
            ),
            g AS (
                SELECT doc_id,
                       LIST_DISTINCT(LIST_TRANSFORM(
                           GENERATE_SERIES(1, LEN(words) - 1),
                           i -> ARRAY_TO_STRING(words[i:i + 1], ' ')))
                           AS grams
                FROM w
            ),
            ex AS (SELECT doc_id, UNNEST(grams) AS gram FROM g)
            SELECT gram, COUNT(*) AS df,
                   ARRAY_TO_STRING(LIST(doc_id ORDER BY doc_id), ',')
                       AS postings
            FROM ex GROUP BY gram HAVING COUNT(*) >= 5
        """,
        "group_quantiles": """
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.25) AS q1,
                   quantile_cont(l_quantity, 0.5) AS median,
                   quantile_cont(l_quantity, 0.75) AS q3,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "doc_dup_line_fraction": f"""
            WITH d AS (
                SELECT doc_id, {oracles.word_chunks_sql('text')} AS chunks
                FROM documents WHERE text IS NOT NULL
            ),
            l AS (
                SELECT doc_id, UNNEST(chunks) AS line FROM d
            ),
            per_line AS (
                SELECT doc_id, line, LENGTH(line) AS len,
                       COUNT(*) AS c
                FROM l GROUP BY doc_id, line
            ),
            per_doc AS (
                SELECT doc_id,
                       CAST(SUM(c) AS BIGINT) AS n_lines,
                       CAST(SUM(c - 1) AS BIGINT) AS dup_lines,
                       CAST(SUM(c * len) AS BIGINT) AS line_chars,
                       CAST(SUM((c - 1) * len) AS BIGINT) AS dup_chars
                FROM per_line GROUP BY doc_id
            )
            SELECT doc_id, n_lines, dup_lines, dup_chars,
                   CASE WHEN n_lines = 0 THEN 0.0
                        ELSE CAST(dup_lines AS DOUBLE) / n_lines
                   END AS dup_line_frac,
                   CASE WHEN line_chars = 0 THEN 0.0
                        ELSE CAST(dup_chars AS DOUBLE) / line_chars
                   END AS dup_char_frac
            FROM per_doc
        """,
        "stratified_sample": """
            SELECT lang, doc_id, sample_rank FROM (
                SELECT lang, doc_id,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS BIGINT) AS sample_rank
                FROM documents
            ) WHERE sample_rank <= 20
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                            CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                         / COUNT(*), 4) AS avg_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_compound": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
            FROM lineitem
            WHERE (l_discount > 0.05 OR l_tax < 0.03)
              AND l_quantity BETWEEN 10 AND 40
              AND l_shipdate >= TIMESTAMP '1996-01-01'
        """,
        "filter_sql_string": """
            SELECT user_id, COUNT(*) AS n_errors
            FROM events
            WHERE event_type = 'error' AND value > 100
            GROUP BY user_id
        """,
        "project_compute": """
            SELECT l_orderkey, l_linenumber,
                   l_orderkey & 32767 AS key_low15,
                   CAST(FLOOR((l_quantity * 10) / 7) + 1 AS BIGINT) AS expected_frames,
                   CAST(l_linenumber AS VARCHAR) AS line_str,
                   CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              CAST(1 - l_discount AS DECIMAL(4,2)) *
                              CAST(1 + l_tax AS DECIMAL(4,2)), 2) AS DOUBLE) AS charge
            FROM lineitem
        """,
        "broadcast_dim_join": """
            SELECT r_name, COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "multi_join_agg": """
            SELECT o_orderkey,
                   STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                            CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1997-01-01'
            GROUP BY o_orderkey, o_orderdate
        """,
        "semi_join_exists": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "anti_join_resume": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "dedup_then_join": """
            SELECT c_mktsegment, COUNT(*) AS n_customers,
                   CAST(SUM(first_orderkey) AS BIGINT) AS sum_first_key
            FROM (SELECT o_custkey, MIN(o_orderkey) AS first_orderkey
                  FROM orders GROUP BY o_custkey) fo
            JOIN customer ON fo.o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "group_distinct_violation": """
            SELECT COUNT(*) AS n_users,
                   CAST(COUNT(*) FILTER (WHERE n_types <> 5) AS BIGINT) AS n_violations
            FROM (SELECT user_id, COUNT(DISTINCT event_type) AS n_types
                  FROM events GROUP BY user_id)
        """,
        "group_mode": """
            SELECT user_id, event_type AS modal_event
            FROM (SELECT user_id, event_type, COUNT(*) AS c
                  FROM events GROUP BY user_id, event_type)
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY c DESC, event_type ASC) = 1
        """,
        "latest_per_key": """
            SELECT user_id, event_id, event_type, ROUND(value, 2) AS value
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "window_running_sum": """
            SELECT event_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
            FROM events
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "union_append": """
            SELECT o_orderpriority, COUNT(*) AS n_orders
            FROM (
                SELECT * FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT * FROM orders
                WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1997-01-01'
            )
            GROUP BY o_orderpriority
        """,
        "string_funcs": """
            SELECT STRFTIME(o_orderdate, '%Y-%m') AS month_str,
                   REGEXP_REPLACE(o_orderpriority, '^\\d-', '', 'g') AS prio_clean,
                   SUBSTRING(o_orderstatus, 1, 1) AS status_c,
                   STRING_SPLIT(o_orderpriority, '-')[1] AS prio_num,
                   COUNT(*) AS n
            FROM orders
            GROUP BY 1, 2, 3, 4
        """,
        "json_regex_extract": """
            SELECT event_type,
                   CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(*) AS n
            FROM events
            GROUP BY event_type
        """,
        "value_remap": """
            SELECT CASE WHEN n_regionkey = 0 THEN 'ZONE_A'
                        WHEN n_regionkey = 1 THEN 'ZONE_B'
                        ELSE 'ZONE_OTHER' END AS zone,
                   COUNT(*) AS n_nations
            FROM nation
            GROUP BY 1
        """,
        "prescale_sample": """
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE doc_id % 7 = 0
        """,
        "events_minmax": """
            SELECT event_type,
                   ROUND(MIN(value), 2) AS min_value,
                   ROUND(MAX(value), 2) AS max_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events
            GROUP BY event_type
        """,
        "array_stats": """
            SELECT vec_id,
                   CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                   LEN(LIST_FILTER(embedding, x -> x > 0.25)) > 0 AS has_big,
                   CAST(LEN(embedding) AS BIGINT) AS dim
            FROM embeddings
        """,
        "array_norm": """
            SELECT vec_id,
                   ROUND(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                                                 x -> x * x)), 4) AS norm_sq
            FROM embeddings
        """,
        "array_slice": """
            SELECT vec_id,
                   ROUND(LIST_SUM(CAST(embedding[1:8] AS DOUBLE[])) / 8, 4) AS head_mean
            FROM embeddings
        """,
        "cosine_knn": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), qv) /
                         (SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) *
                          SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> x*x)))), 4) AS cosine
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "doc_word_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_words,
                   CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_words,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY lang
        """,
        "doc_stopword_fraction": f"""
            SELECT lang,
                   CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                            w -> w IN ({_MARKER_SQL})))) AS DOUBLE)
                   / CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS DOUBLE)
                   AS stopword_fraction
            FROM documents
            GROUP BY lang
        """,
        "doc_token_count": """
            SELECT source,
                   CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '\\w+|[^\\w\\s]'))) AS BIGINT)
                   AS total_tokens
            FROM documents
            GROUP BY source
        """,
        "doc_exact_dedup": """
            SELECT COUNT(*) AS n_docs,
                   COUNT(DISTINCT MD5(text)) AS n_unique_texts
            FROM documents
        """,
        "doc_lang_mode": """
            SELECT source, lang AS modal_lang
            FROM (SELECT source, lang, COUNT(*) AS c
                  FROM documents GROUP BY source, lang)
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY c DESC, lang ASC) = 1
        """,
        "ngram_jaccard": """
            WITH d AS (
                SELECT doc_id, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS w
                FROM documents WHERE doc_id < 40
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CAST(LEN(LIST_INTERSECT(a.w, b.w)) AS DOUBLE) /
                         (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w))), 4)
                   AS jaccard
            FROM d a, d b
            WHERE a.doc_id < b.doc_id
              AND CAST(LEN(LIST_INTERSECT(a.w, b.w)) AS DOUBLE) /
                  (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w))) >= 0.4
        """,
        "dedup_clusters": """
            WITH RECURSIVE dd AS (
                SELECT doc_id, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS w
                FROM documents WHERE doc_id < 40
            ),
            p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM dd a, dd b
                WHERE a.doc_id < b.doc_id
                  AND CAST(LEN(LIST_INTERSECT(a.w, b.w)) AS DOUBLE) /
                      (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w))) >= 0.4
            ),
            edges AS (
                SELECT id_a AS s, id_b AS t FROM p
                UNION SELECT id_b, id_a FROM p
            ),
            reach(id, r) AS (
                SELECT s, s FROM edges
                UNION
                SELECT e.s, reach.r FROM edges e JOIN reach ON e.t = reach.id
            )
            SELECT id, MIN(r) AS component
            FROM reach
            GROUP BY id
        """,
        "quality_keep_summary": f"""
            WITH scored AS (
                SELECT lang,
                       LEN(STRING_SPLIT(text, ' ')) AS wc,
                       CASE WHEN LENGTH(text) = 0 THEN 0.0
                            ELSE CAST(LENGTH(REGEXP_REPLACE(text,
                                 '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS DOUBLE)
                                 / LENGTH(text) END AS sym_ratio,
                       CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                            w -> w IN ({_MARKER_SQL}))) AS DOUBLE)
                       / LEN(STRING_SPLIT(text, ' ')) AS stop_frac
                FROM documents
            )
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(COUNT(*) FILTER (WHERE wc >= 15 AND sym_ratio <= 0.08
                        AND stop_frac >= (CASE WHEN lang = 'zh' THEN 0.0 ELSE 0.05 END))
                        AS BIGINT) AS n_keep,
                   CAST(COUNT(*) FILTER (WHERE NOT (wc >= 15 AND sym_ratio <= 0.08
                        AND stop_frac >= (CASE WHEN lang = 'zh' THEN 0.0 ELSE 0.05 END)))
                        AS BIGINT) AS n_drop
            FROM scored
            GROUP BY lang
        """,
        "doc_fingerprint": """
            SELECT CAST(('0x' || SUBSTRING(MD5(text), 1, 2))::BIGINT AS BIGINT) AS fp_bucket,
                   COUNT(*) AS n
            FROM documents
            GROUP BY 1
        """,
        "pivot_matrix": """
            SELECT user_id,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'login') AS BIGINT) AS login,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
            FROM events
            WHERE user_id < 20
            GROUP BY user_id
        """,
        "channel_stats": """
            SELECT event_type,
                   ROUND(AVG(value), 3) AS avg_value,
                   ROUND(STDDEV_SAMP(value), 3) AS std_value,
                   ROUND(MEDIAN(value), 3) AS median_value,
                   COUNT(*) AS n
            FROM events
            GROUP BY event_type
        """,
        "cube_metrics": """
            SELECT lang, source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY CUBE (lang, source)
        """,
        "tz_format": """
            SELECT STRFTIME(TIMEZONE('Europe/Zurich', ts::TIMESTAMPTZ),
                            '%Y-%m-%d %H') AS zurich_hour,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1
        """,
        "record_select": """
            SELECT event_id, user_id, event_type
            FROM events
            WHERE user_id = (SELECT MIN(user_id) FROM events)
            ORDER BY event_id
        """,
        "salted_source_agg": """
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   MIN(doc_id) AS min_id,
                   MAX(doc_id) AS max_id
            FROM documents
            GROUP BY source
        """,
        "desparsify_check": """
            WITH p AS (
                SELECT doc_id,
                       16 + doc_id % 17 AS n,
                       doc_id * 100 AS fv,
                       3 + doc_id % 5 AS i1,
                       2 + doc_id % 7 AS v0,
                       -(doc_id % 3) AS v1
                FROM documents
            )
            SELECT doc_id,
                   CAST(fv + v0 * (n - 1) + v1 * (n - 1 - i1) AS BIGINT) AS last_val,
                   CAST(n * fv + v0 * ((n - 1) * n / 2)
                        + v1 * ((n - 1 - i1) * (n - i1) / 2) AS BIGINT) AS arr_sum
            FROM p
        """,
        "cosine_dup_pairs": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 150
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(LIST_DOT_PRODUCT(a.v, b.v) /
                         (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) *
                          SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 4) AS cosine
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND LIST_DOT_PRODUCT(a.v, b.v) /
                  (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) *
                   SQRT(LIST_DOT_PRODUCT(b.v, b.v))) >= 0.35
        """,
    }
