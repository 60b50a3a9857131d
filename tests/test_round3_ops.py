"""Semantic tests for the round-3 operators: as-of join (vs pandas
merge_asof), sessionization (vs a brute-force loop), URL
canonicalization (explicit cases + idempotence), duplicate-line
fractions, stratified sampling (exactness + partitioning
invariance)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dqmtools_spark.functions.urls import canonical_url
from dqmtools_spark.operators.asof import asof_join
from dqmtools_spark.operators.repetition import dup_line_stats
from dqmtools_spark.operators.sampling import stratified_hash_sample
from dqmtools_spark.operators.sessions import session_summary, sessionize


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(4), _ts(rng.randrange(10_000))) for i in range(300)]
    right = [
        (1000 + i, rng.randrange(4), _ts(rng.randrange(10_000)))
        for i in range(200)
    ]
    # unique per (key, ts) — the operator's documented contract
    seen: dict[tuple, int] = {}
    right = [r for r in right if seen.setdefault((r[1], r[2]), r[0]) == r[0]]

    ldf = spark.createDataFrame(left, ["lid", "k", "ts"])
    rdf = spark.createDataFrame(right, ["rid", "k", "rts"])
    got = (
        asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
        .select("lid", "asof_rid")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["rid", "k", "rts"]).sort_values("rts")
    want = (
        pd.merge_asof(
            lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert got["asof_rid"].astype("Int64").equals(want["rid"].astype("Int64"))


def test_asof_join_inclusive_and_outer(spark):
    ldf = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(5)), (3, 2, _ts(0))], ["lid", "k", "ts"]
    )
    rdf = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(4))], ["rid", "k", "rts"]
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
        .collect()
    }
    assert out[1] == 100  # equal timestamp matches (inclusive)
    assert out[2] == 101
    assert out[3] is None  # no right row for key 2 -> left-outer NULL


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


def _brute_sessions(events, gap_minutes):
    """events: (key, ts, id) -> {(key, seq): [ids]} by definition."""
    out: dict[tuple, list] = {}
    bykey: dict[int, list] = {}
    for k, ts, i in events:
        bykey.setdefault(k, []).append((ts, i))
    for k, evs in bykey.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev) > dt.timedelta(minutes=gap_minutes):
                seq += 1
            out.setdefault((k, seq), []).append(i)
            prev = ts
    return out


def test_sessionize_matches_bruteforce(spark):
    rng = random.Random(11)
    events = [
        (rng.randrange(5), _ts(rng.randrange(3_000)), i) for i in range(400)
    ]
    df = spark.createDataFrame(events, ["k", "ts", "eid"])
    got = sessionize(df, "k", "ts", gap_minutes=30, tiebreak="eid").collect()
    want = _brute_sessions(events, 30)
    got_map: dict[tuple, list] = {}
    for r in got:
        got_map.setdefault((r["k"], r["session_seq"]), []).append(r["eid"])
    assert {k: sorted(v) for k, v in got_map.items()} == {
        k: sorted(v) for k, v in want.items()
    }

    summ = session_summary(df, "k", "ts", gap_minutes=30, tiebreak="eid")
    assert summ.count() == len(want)
    # exact boundary: gap == threshold does NOT split (strict >)
    b = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(30), 2), (1, _ts(60.001), 3)],
        ["k", "ts", "eid"],
    )
    seqs = {
        r["eid"]: r["session_seq"]
        for r in sessionize(b, "k", "ts", 30, tiebreak="eid").collect()
    }
    assert seqs == {1: 1, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

URL_CASES = [
    ("https://site.com/a", "https://site.com/a"),
    ("HTTPS://WWW.Site.COM/A/B/", "https://site.com/A/B"),
    ("https://site.com:443/a?x=1", "https://site.com/a?x=1"),
    ("http://site.com:80/a#frag", "http://site.com/a"),
    ("https://site.com/a?utm_source=x", "https://site.com/a"),
    ("https://site.com/a?utm_source=x&b=2", "https://site.com/a?b=2"),
    ("https://site.com/a?b=2&utm_source=x", "https://site.com/a?b=2"),
    (
        "https://site.com/a?utm_a=1&utm_b=2&fbclid=z&c=3",
        "https://site.com/a?c=3",
    ),
    ("https://site.com/a?gclid=1&utm_x=2", "https://site.com/a"),
    ("  https://site.com/  ", "https://site.com"),
    ("https://site.com", "https://site.com"),
    # path/query case preserved, host lowered
    ("HtTp://ExAmPle.org/Path?Q=UPPER", "http://example.org/Path?Q=UPPER"),
    # authority rewrites are HEAD-anchored: path/query content survives
    ("https://site.com/a:80/b", "https://site.com/a:80/b"),
    ("https://site.com/r?next=http://y.com:80/z",
     "https://site.com/r?next=http://y.com:80/z"),
    ("https://site.com/r?u=x://www.q.com", "https://site.com/r?u=x://www.q.com"),
    # literal '?' inside a value: syntactic rewrite hits BOTH (engines
    # must agree — DuckDB needs the 'g' flag here)
    ("https://s.com/p?utm_a=1&x=a?utm_b=2&c=3", "https://s.com/p?x=a?c=3"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["u"])
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [want for _, want in URL_CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["u"])
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(canonical_url("c").alias("c2"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


# ---------------------------------------------------------------------------
# duplicate-line fractions
# ---------------------------------------------------------------------------


def test_dup_line_stats_hand_example(spark):
    df = spark.createDataFrame(
        [
            (1, ["aa", "b", "aa", "aa", "cc"]),  # 'aa' x3 -> 2 dups
            (2, ["x", "y"]),
            (3, [""]),
        ],
        ["doc_id", "lines"],
    )
    rows = {
        r["doc_id"]: r
        for r in dup_line_stats(df, F.col("lines"), "doc_id").collect()
    }
    r1 = rows[1]
    assert (r1["n_lines"], r1["dup_lines"], r1["dup_chars"]) == (5, 2, 4)
    assert r1["dup_line_frac"] == 2 / 5
    assert r1["dup_char_frac"] == 4 / 9  # line chars: 3*2 + 1 + 2 = 9
    assert rows[2]["dup_lines"] == 0 and rows[2]["dup_line_frac"] == 0.0
    # empty line: zero chars -> char fraction uses the 0-denominator guard
    assert rows[3]["dup_char_frac"] == 0.0


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_k_and_partition_invariant(spark):
    rows = [(i, f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "stratum"])
    out = stratified_hash_sample(df, ["stratum"], "id", k=7)
    per = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"s0": 7, "s1": 7, "s2": 7}
    # small cell: returns the whole cell
    tiny = spark.createDataFrame([(1, "a"), (2, "a")], ["id", "stratum"])
    assert stratified_hash_sample(tiny, ["stratum"], "id", k=7).count() == 2
    # identical selection regardless of physical partitioning
    a = {(r["stratum"], r["id"]) for r in out.collect()}
    b = {
        (r["stratum"], r["id"])
        for r in stratified_hash_sample(
            df.repartition(17), ["stratum"], "id", k=7
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Bloom-filter membership
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_planted_dups(spark):
    from dqmtools_spark.operators.bloom import bloom_build, bloom_probe

    corpus = spark.createDataFrame(
        [(f"doc text {i}",) for i in range(300)], ["text"]
    )
    # 40 planted exact dups + 60 novel probes
    probe = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(40)]
        + [(100 + i, f"novel {i}") for i in range(60)],
        ["pid", "text"],
    )
    words = bloom_build(corpus, "text", m_bits=1 << 14, k=5)
    out = {
        r["pid"]: r["maybe_member"]
        for r in bloom_probe(
            probe, words, "text", "pid", m_bits=1 << 14, k=5
        ).collect()
    }
    assert all(out[i] for i in range(40)), "false negative: law violated"
    # m=16384, n=300, k=5 -> fp ~ (1-e^-0.09)^5 ~ 5e-6: novels stay out
    fps = sum(out[100 + i] for i in range(60))
    assert fps == 0, f"unexpected false positives at this sizing: {fps}"


def test_bloom_word_table_is_bounded(spark):
    from dqmtools_spark.operators.bloom import bloom_build

    corpus = spark.createDataFrame([(f"t{i}",) for i in range(500)], ["text"])
    words = bloom_build(corpus, "text", m_bits=1024, k=5).collect()
    assert len(words) <= 1024 // 63 + 1
    assert all(r["word"] >= 0 for r in words)  # sign bit never touched


def test_canonical_url_cross_engine_fuzz(spark):
    """400 generated messy URLs through BOTH renderings — the Spark
    Column chain and the DuckDB RE2 SQL — must agree byte-for-byte.
    This is the guard behind the url_canon_dedup oracle: the two regex
    engines share the pattern subset by construction, and this fuzz
    covers orderings/combinations the hand-picked cases don't."""
    import duckdb

    from dqmtools_spark.functions.urls import canonical_url_sql

    rng = random.Random(1234)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://"]
    hosts = ["Site.com", "a.example.ORG", "x-y.net", "WWW.deep.sub.io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/A/b/", "/p/1/2", "/Path.html", "/a:80/b", "/x:443"]
    tracking = ["utm_source=x", "utm_ab12=Q", "fbclid=zZ9", "gclid=1"]
    normal = ["id=3", "q=Hello", "page=2", "A=B",
              "next=http://y.com:80/z", "v=a?utm_k=9", "u=x://www.q.com"]
    frags = ["", "#frag", "#Sec.2"]
    urls = []
    for _ in range(400):
        ps = rng.sample(tracking, rng.randrange(3)) + rng.sample(
            normal, rng.randrange(3)
        )
        rng.shuffle(ps)
        q = ("?" + "&".join(ps)) if ps else ""
        u = (
            rng.choice(["", " ", "  "])
            + rng.choice(schemes)
            + ("www." if rng.random() < 0.3 else "")
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + q
            + rng.choice(frags)
            + rng.choice(["", " "])
        )
        urls.append(u)

    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = [r[0] for r in df.select(canonical_url("u")).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, u VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(urls))
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('u')} FROM t ORDER BY i"
        ).fetchall()
    ]
    mismatches = [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ]
    assert not mismatches, mismatches[:5]


# ---------------------------------------------------------------------------
# blocked fuzzy matching
# ---------------------------------------------------------------------------


def test_blocked_levenshtein_planted_typos(spark):
    from dqmtools_spark.operators.fuzzy import blocked_levenshtein_pairs

    rows = [
        (1, "alpha the quick brown fox"),
        (2, "alpha the quick brwon fox"),   # transposition: dist 2
        (3, "alpha a completely different thing"),
        (4, "beta the quick brown fox"),    # other block: never compared
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["id", "title"])
    out = blocked_levenshtein_pairs(
        df,
        key=F.col("title"),
        block=F.split(F.col("title"), " ").getItem(0),
        id_col="id",
        max_dist=3,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(1, 2, 2)]
    # cross-block identical suffix (1 vs 4) must NOT pair: blocking is
    # a recall tradeoff by design, documented in the module


def test_asof_join_null_timestamps(spark):
    """NULL right_ts never matches; NULL left_ts matches nothing —
    same as DuckDB ASOF (NULL comparison) and pandas merge_asof."""
    import pyspark.sql.types as T

    lschema = T.StructType([
        T.StructField("lid", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rschema = T.StructType([
        T.StructField("rid", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("rts", T.TimestampType()),
    ])
    ldf = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, None)], schema=lschema
    )
    rdf = spark.createDataFrame(
        [(100, 1, None), (101, 1, _ts(5))], schema=rschema
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts")
        .collect()
    }
    assert out == {1: 101, 2: None}  # NULL-ts right row (rid=100) ignored


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_exact_when_wide(spark):
    from dqmtools_spark.operators.sketch import cms_build, cms_estimate

    rng = random.Random(3)
    rows = [(f"k{rng.randrange(50)}",) for _ in range(2000)]
    df = spark.createDataFrame(rows, ["k"])
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    keys = df.distinct()
    # tight sketch: may overestimate, must NEVER undercount
    sk = cms_build(df, "k", width=32, depth=4)
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(keys, sk, "k", width=32, depth=4).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch: 50 keys in 4x4096 counters -> collisions across all
    # 4 rows are (50/4096)^4-improbable; estimates are exact
    skw = cms_build(df, "k", width=4096, depth=4)
    estw = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(keys, skw, "k", width=4096, depth=4).collect()
    }
    assert estw == exact
    # unseen key -> 0 (or collision mass), never negative
    probe = spark.createDataFrame([("never-seen",)], ["k"])
    v = cms_estimate(probe, skw, "k", width=4096, depth=4).collect()[0]
    assert v["cms_est"] >= 0


def test_hll_accuracy_and_merge(spark):
    from dqmtools_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame([(f"u{i}",) for i in range(5000)], ["k"])
    est = hll_estimate(hll_registers(df, "k", m=32), m=32).collect()[0][
        "hll_raw"
    ]
    # m=32 raw estimator: std error ~ 1.04/sqrt(32) ~ 18%
    assert abs(est - 5000) / 5000 < 0.5, est
    # shard merge = register-wise MAX == one build over the union
    a = hll_registers(df.filter(F.col("k") < "u25"), "k", m=32)
    b = hll_registers(df.filter(F.col("k") >= "u25"), "k", m=32)
    merged = (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    whole = hll_estimate(hll_registers(df, "k", m=32), m=32).collect()
    assert hll_estimate(merged, m=32).collect() == whole


# ---------------------------------------------------------------------------
# interval-point range join
# ---------------------------------------------------------------------------


def test_interval_point_join_matches_bruteforce(spark):
    from dqmtools_spark.operators.ranges import interval_point_join

    rng = random.Random(21)
    # narrow buckets (1h) + intervals up to 10h wide -> every interval
    # spans many buckets, exercising the explode path
    ivs = []
    for i in range(80):
        s = rng.randrange(10_000)
        ivs.append((i, rng.randrange(3), _ts(s), _ts(s + rng.randrange(1, 600))))
    pts = [(1000 + i, rng.randrange(3), _ts(rng.randrange(10_600)))
           for i in range(300)]
    idf = spark.createDataFrame(ivs, ["iid", "k", "s", "e"])
    pdf = spark.createDataFrame(pts, ["pid", "k", "t"])
    got = {
        (r["iid"], r["pid"])
        for r in interval_point_join(
            idf, pdf, "k", "s", "e", "t", bucket_minutes=60
        ).collect()
    }
    want = {
        (i, p)
        for (i, k1, s, e) in ivs
        for (p, k2, t) in pts
        if k1 == k2 and s <= t <= e
    }
    assert got == want and len(want) > 50
    # boundary inclusivity: point exactly at start and at end both match
    idf2 = spark.createDataFrame([(1, 1, _ts(0), _ts(60))], ["iid", "k", "s", "e"])
    pdf2 = spark.createDataFrame(
        [(10, 1, _ts(0)), (11, 1, _ts(60)), (12, 1, _ts(60.001))],
        ["pid", "k", "t"],
    )
    hits = {
        r["pid"]
        for r in interval_point_join(
            idf2, pdf2, "k", "s", "e", "t", bucket_minutes=60
        ).collect()
    }
    assert hits == {10, 11}


# ---------------------------------------------------------------------------
# small-file compaction
# ---------------------------------------------------------------------------


def test_compact_table_reduces_files_content_identical(spark, tmp_path):
    from dqmtools_spark.sources.tables import compact_table

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 4}", float(i)) for i in range(4000)], ["id", "part", "v"]
    )
    # simulate incremental appends: 40 tiny files
    for chunk in range(20):
        df.filter((F.col("id") % 20) == chunk).coalesce(2).write.mode(
            "append"
        ).parquet(p)
    before = spark.read.parquet(p).toPandas().sort_values("id")

    stats = compact_table(spark, p, target_rows_per_file=2000)
    assert stats["files_before"] >= 40
    assert stats["files_after"] <= 4
    assert stats["rows"] == 4000
    after = spark.read.parquet(p).toPandas().sort_values("id")
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))


def test_hll_field_width_scales_with_m(spark):
    """The review's empirical failure case: m != 32 must not bias the
    estimate (field width is 60 - log2(m), not a constant)."""
    from dqmtools_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame([(f"u{i}",) for i in range(20_000)], ["k"])
    # the constant-55 bug gave 0.58x at m=16 and 1.89x at m=64; the raw
    # estimator's real sigma is ~1.04-1.3/sqrt(m), so a (0.6, 1.5) band
    # on this DETERMINISTIC key set separates fixed from broken
    # (measured fixed ratios here: 1.17 / 1.35 / 0.94)
    for m in (16, 32, 64):
        est = hll_estimate(hll_registers(df, "k", m=m), m=m).collect()[0][
            "hll_raw"
        ]
        assert 0.6 < est / 20_000 < 1.5, (m, est)
    with pytest.raises(ValueError):
        hll_registers(df, "k", m=48)


def test_interval_join_rejects_colliding_columns(spark):
    from dqmtools_spark.operators.ranges import interval_point_join

    idf = spark.createDataFrame([(1, 1, _ts(0), _ts(9))], ["iid", "k", "s", "e"])
    pdf = spark.createDataFrame([(2, 1, _ts(1))], ["iid", "k", "t"])
    with pytest.raises(ValueError, match="share non-key columns"):
        interval_point_join(idf, pdf, "k", "s", "e", "t")
    pdf2 = spark.createDataFrame([(2, 1, _ts(1))], ["pid", "k", "_bkt"])
    with pytest.raises(ValueError, match="reserved"):
        interval_point_join(idf, pdf2, "k", "s", "e", "_bkt")


def test_compact_table_partitioned_honors_target_and_recovers(spark, tmp_path):
    import os
    import shutil

    from dqmtools_spark.sources.tables import compact_table

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", float(i)) for i in range(10_000)], ["id", "part", "v"]
    )
    for chunk in range(10):
        df.filter((F.col("id") % 10) == chunk).coalesce(3).write.mode(
            "append"
        ).partitionBy("part").parquet(p)
    before = spark.read.parquet(p).toPandas().sort_values("id")

    stats = compact_table(
        spark, p, target_rows_per_file=1000, partition_by=["part"]
    )
    assert stats["rows"] == 10_000
    # 5000 rows/partition at 1000/file -> ~5 files per partition, NOT 1
    # (the one-file-per-partition-value collapse was the review bug)
    per_part = {
        d: sum(
            1 for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet")
        )
        for d in os.listdir(p)
        if d.startswith("part=")
    }
    assert all(n >= 5 for n in per_part.values()), per_part
    after = spark.read.parquet(p).toPandas().sort_values("id")
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))

    # crash recovery: simulate a crash between the two renames
    backup = p + "._precompact"
    os.rename(p, backup)
    stats2 = compact_table(spark, p, target_rows_per_file=5000)
    assert stats2["rows"] == 10_000
    assert not os.path.exists(backup)
    # and a stale backup next to a live table is cleaned up
    shutil.copytree(p, backup)
    compact_table(spark, p, target_rows_per_file=5000)
    assert not os.path.exists(backup)
