"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline.  Dot products run as
  ``aggregate(zip_with(...))`` higher-order functions — JVM-side, no
  Python — and top-k is a single reduce (orderBy+limit collapses to
  TakeOrderedAndProject: no global sort materialization).
- LSH-bucketed ANN: deterministic random-hyperplane signatures
  (numpy matmul inside a pandas UDF, one Arrow batch per task), search
  restricted to the query's bucket (+ multiprobe neighbors).  The
  scale path: bucket key is the shuffle/partition key, so a 10^12-row
  index probes one bucket's partitions instead of the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col).asc()).limit(k)


# ------------------------------------------------------------- LSH ANN


def n_planes_for_corpus(
    expected_rows: int, target_bucket_rows: int = 1024
) -> int:
    """Plane count sized to the corpus: ``2^n`` buckets, so the expected
    bucket occupancy is ``expected_rows / 2^n`` and
    ``n = ceil(log2(expected_rows / target_bucket_rows))``.

    Intra-bucket candidate generation is QUADRATIC in occupancy, so a
    fixed plane count does not survive scale-up: at 100x the corpus the
    buckets hold 100x the rows and the bucket self-join does 10^4x the
    work.  Growing n_planes with log2(corpus) keeps occupancy — and
    therefore per-bucket cost — constant; the price is recall (each
    extra plane multiplies pair-collision probability by
    (1 - theta/pi)), which multiprobe or an OR-construction (several
    independent plane sets unioned) buys back.  See SCALE.md
    "Embedding LSH plane-count scaling".

    ``expected_rows`` is caller-supplied (a catalog rowcount estimate is
    fine) — deriving it with ``df.count()`` would add a full scan before
    index build.
    """
    import math

    if expected_rows <= 0:
        raise ValueError(f"expected_rows must be positive, got {expected_rows}")
    if target_bucket_rows <= 0:
        raise ValueError(
            f"target_bucket_rows must be positive, got {target_bucket_rows}"
        )
    return max(1, math.ceil(math.log2(max(expected_rows / target_bucket_rows, 2.0))))


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def hyperplane_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """pandas UDF: embedding -> int bucket (sign pattern of n_planes
    random projections).  One numpy matmul per Arrow batch."""
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy())  # (batch, dim)
        signs = (mat @ planes) >= 0  # (batch, n_planes)
        vals = signs @ (1 << np.arange(n_planes))
        return pd.Series(vals.astype(np.int32))

    return bucket


def build_ann_index(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int | None = 12,
    seed: int = 42,
    expected_rows: int | None = None,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Attach a deterministic LSH ``bucket`` column.  At scale, persist
    partitioned/bucketed by this column so probes prune partitions.

    ``dim`` is required: inferring it from the data would cost a driver
    round-trip (``.first()``) inside index construction — the embedding
    dimension is a property of the model that produced the vectors, so
    the caller always knows it.

    Pass ``n_planes=None`` with ``expected_rows`` (a catalog estimate of
    the corpus size) to size the plane count from the corpus via
    :func:`n_planes_for_corpus` — the form that keeps per-bucket cost
    constant across scale-ups.
    """
    if n_planes is None:
        if expected_rows is None:
            raise ValueError("n_planes=None requires expected_rows")
        n_planes = n_planes_for_corpus(expected_rows, target_bucket_rows)
    bucket_udf = hyperplane_bucket_udf(dim, n_planes, seed)
    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def ann_probe_buckets(
    query: list[float],
    n_planes: int = 12,
    seed: int = 42,
    n_probes: int = 4,
) -> list[int]:
    """The float-LSH probe rule, driver-side: the query's own bucket
    plus the ``n_probes - 1`` nearest multiprobe buckets (single-bit
    flips of the planes with smallest |projection| — the least
    confident signs).  Shared by :func:`ann_query` and the recall
    benchmark (``scripts/ann_recall.py``) so both measure the same
    rule."""
    q = np.asarray(query, dtype=np.float64)
    planes = _planes(len(query), n_planes, seed)
    proj = q @ planes
    base = int(((proj >= 0) @ (1 << np.arange(n_planes))))
    flips = np.argsort(np.abs(proj))[: max(n_probes - 1, 0)]
    return [base] + [base ^ (1 << int(i)) for i in flips]


def ann_query(
    indexed: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    n_probes: int = 4,
) -> DataFrame:
    """Approximate top-k: score only rows in the probe buckets (see
    :func:`ann_probe_buckets`)."""
    buckets = ann_probe_buckets(query, n_planes, seed, n_probes)
    cand = indexed.filter(F.col("bucket").isin(buckets))
    return cosine_topk(cand, vec_col, id_col, query, k)


# ---------------------------------------------------- integer-plane LSH
#
# A second hyperplane family in EXACT integer arithmetic, so the bucket
# assignment is reproducible bit-for-bit in any engine (numpy, Spark
# JVM expressions, DuckDB SQL) — the oracle-checkable tier.  Vectors
# are quantized to int64 as floor(v * QUANT_SCALE): floor is exactly
# defined on the already-computed double (one IEEE multiply, identical
# everywhere), so there is NO rounding-mode freedom at all.  (round()
# would NOT be safe: the double v*10^6 can land exactly on k+0.5 —
# e.g. float32 1/128 * 1e6 == 7812.5 — where numpy's half-even, Java's
# HALF_UP and C's half-away disagree.)  Planes are small deterministic
# integers; all dot products stay below 2^40, far inside both int64 and
# the 2^53 exact-double window, so every engine computes identical
# projections and identical sign buckets.

QUANT_SCALE = 1_000_000


def int_planes(dim: int, n_planes: int, scale: int = 999, tag: str = "plane") -> list[list[int]]:
    """Deterministic integer hyperplanes in [-scale, scale], derived
    from md5 of (tag, plane, coord) — no RNG library dependence, so the
    same literals embed into Spark plans and oracle SQL."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{tag}:{p}:{i}".encode()).digest()[:8], "big"
            )
            row.append(h % (2 * scale + 1) - scale)
        planes.append(row)
    return planes


def quantize_vec(col: Column) -> Column:
    """array<float> -> array<long> as floor(x * QUANT_SCALE) — exact
    and rounding-mode-free, identical in Spark/DuckDB/numpy/Python."""
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(QUANT_SCALE))).cast("long"),
    )


def int_bucket_udf(planes: list[list[int]]):
    """pandas UDF: embedding -> int bucket via integer hyperplane signs.
    One int64 matmul per Arrow batch; exact (no float rounding in the
    decision), so numpy here == JVM expression == SQL oracle."""
    pl = np.asarray(planes, dtype=np.int64).T  # (dim, n_planes)
    weights = (1 << np.arange(len(planes))).astype(np.int64)

    @F.pandas_udf(T.IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        q = np.floor(mat * QUANT_SCALE).astype(np.int64)  # exact, mode-free
        signs = (q @ pl) >= 0
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def int_bucket_expr(vec_col: Column, planes: list[list[int]]) -> Column:
    """JVM-expression twin of :func:`int_bucket_udf` (same values):
    per-plane integer dot via zip_with/aggregate HOFs.  Used by plan
    audits and small inputs; the pandas UDF is the batch path."""
    q = quantize_vec(vec_col)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(int(w)) for w in plane])
        proj = F.aggregate(
            F.zip_with(q, lit_plane, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def build_int_ann_index(
    df: DataFrame, vec_col: str, planes: list[list[int]], impl: str = "pandas"
) -> DataFrame:
    """Attach the integer-LSH ``bucket`` column (exact tier)."""
    if impl == "pandas":
        return df.withColumn("bucket", int_bucket_udf(planes)(F.col(vec_col)))
    return df.withColumn("bucket", int_bucket_expr(F.col(vec_col), planes))


def int_bucket_py(vec: list[float], planes: list[list[int]]) -> int:
    """Driver-side parity of the bucket function (pure Python ints)."""
    import math

    q = [math.floor(v * QUANT_SCALE) for v in vec]
    b = 0
    for p, plane in enumerate(planes):
        if sum(x * w for x, w in zip(q, plane)) >= 0:
            b |= 1 << p
    return b


def int_ann_probe_buckets(query: list[float], planes: list[list[int]]) -> list[int]:
    """Probe set: the query's bucket plus every Hamming-1 neighbor
    (flip each plane's sign once).  Data-independent probe rule, so an
    oracle can enumerate the same set with pure SQL."""
    base = int_bucket_py(query, planes)
    return [base] + [base ^ (1 << p) for p in range(len(planes))]


def int_ann_query(
    indexed: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    planes: list[list[int]],
    k: int = 10,
) -> DataFrame:
    """Approximate top-k over the integer-LSH index: scan only the
    Hamming<=1 probe buckets, exact cosine top-k within them."""
    cand = indexed.filter(
        F.col("bucket").isin(int_ann_probe_buckets(query, planes))
    )
    return cosine_topk(cand, vec_col, id_col, query, k)


def or_construction_bands(
    p: float, rows_per_band: int, target_recall: float
) -> int:
    """The ONE closed-form OR-construction sizing rule shared by every
    LSH family: a pair whose per-trial collision probability is ``p``
    agrees on a whole band of r trials with p^r and on >= 1 of b
    independent bands with 1 - (1 - p^r)^b, so
    b = ceil(ln(1 - target) / ln(1 - p^r)).  Families differ only in
    how p derives from their similarity threshold (cosine ->
    1 - theta/pi, Jaccard -> s); see :func:`bands_for_recall` and
    ``dedup.minhash_bands_for_recall``."""
    import math

    if not 0.0 < p < 1.0:
        raise ValueError(f"collision probability must be in (0,1), got {p}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0,1), got {target_recall}")
    pr = p**rows_per_band
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr)))


def bands_for_recall(
    threshold: float, planes_per_band: int, target_recall: float = 0.9
) -> int:
    """Band count for the HYPERPLANE OR-construction: per-plane
    collision probability for a pair at exactly ``threshold`` cosine is
    p = 1 - theta/pi (see :func:`or_construction_bands` for the shared
    formula).

    The formula makes the fundamental tradeoff explicit: at LOW cosine
    thresholds p is near 1/2 and the required band count explodes
    (threshold 0.35, r=8 -> 115 bands; r=4 -> 15), i.e. hyperplane LSH
    cannot prune much when the similarity signal is weak — measured in
    BENCH §15.  At near-dup thresholds (0.9+) a handful of bands
    suffices."""
    import math

    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    return or_construction_bands(
        1.0 - math.acos(threshold) / math.pi, planes_per_band, target_recall
    )


def int_multi_bucket_udf(plane_sets: list[list[list[int]]]):
    """pandas UDF: embedding -> array<int> of per-band buckets (one
    bucket per plane set), all bands in ONE numpy matmul per Arrow
    batch.  Same exact integer arithmetic as :func:`int_bucket_udf`
    (floor-quantized int64 dots), so every band's bucket is
    oracle-reproducible."""
    all_planes = np.asarray(
        [p for ps in plane_sets for p in ps], dtype=np.int64
    )
    sizes = [len(ps) for ps in plane_sets]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        q = np.floor(mat * QUANT_SCALE).astype(np.int64)
        signs = (q @ all_planes.T) >= 0  # exact: |dot| < 2^41
        cols, off = [], 0
        for r in sizes:
            cols.append(signs[:, off : off + r] @ (1 << np.arange(r)))
            off += r
        arr = np.stack(cols, axis=1).astype(np.int32)
        return pd.Series(list(arr))

    return buckets


def embedding_cosine_pairs_int_banded(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.9,
    planes_per_band: int = 8,
    n_bands: int | None = None,
    target_recall: float = 0.9,
    persist_buckets: bool = True,
    eager: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold with a BANDED
    (OR-construction) integer-plane LSH — the recall path that the
    single-band :func:`embedding_cosine_pairs_int` (an AND-only
    prefilter, measured 0.3% recall at threshold 0.35) is not:
    ``n_bands`` independent plane sets each bucket the corpus; a pair
    is a candidate if ANY band agrees; exact cosine verifies, so
    precision stays 1.0 and recall is 1 - (1 - p^r)^b (measured to
    track theory in BENCH §15).  ``n_bands=None`` derives the count
    from :func:`bands_for_recall`.

    Plan shape at scale: one Arrow stage computes all band buckets in
    a single matmul; candidates come from ONE equi-join on
    (band, bucket) after a posexplode — the exchange carries
    b x corpus rows (the OR-construction's inherent cost multiplier),
    never a cartesian.  The (id, band, bucket) bucket frame is NARROW
    (three ints) and feeds both self-join sides, so it persists by
    default (``persist_buckets``; same helper-frame discipline as
    ``minhash_lsh_pairs``'s ``persist_shingles`` — without it the
    full-corpus quantize+matmul Arrow stage runs once per side) and
    the duplicate-pair collapse moves ONLY (id, id) pairs — the wide
    embedding arrays rejoin by id afterwards with PRE-COMPUTED norms,
    once per SURVIVING pair side (measured ~3x total at sf0.1 vs
    carrying vectors through the candidate exchange).  ``eager=True``
    materializes the (small) pair result and unpersists the bucket
    frame — the hygienic form for long-lived sessions."""
    from pyspark import StorageLevel

    if n_bands is None:
        n_bands = bands_for_recall(threshold, planes_per_band, target_recall)
    plane_sets = [
        int_planes(dim, planes_per_band, tag=f"band{i}") for i in range(n_bands)
    ]
    bucketize = int_multi_bucket_udf(plane_sets)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(bucketize(F.col(vec_col))).alias("_band", "_bkt"),
    )
    helpers = []
    if persist_buckets:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(base)
    cand = (
        base.select(F.col("_id").alias("id_a"), "_band", "_bkt")
        .join(base.select(F.col("_id").alias("id_b"), "_band", "_bkt"),
              ["_band", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # per-vector norms computed ONCE here instead of twice per
    # candidate pair (the verify is the per-pair hot loop)
    v = F.col(vec_col).cast("array<double>")
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        v.alias("_v"),
        l2_norm(v).alias("_n"),
    )
    out = (
        cand.join(
            vecs.withColumnsRenamed(
                {"_vid": "id_a", "_v": "_va", "_n": "_na"}
            ),
            "id_a",
        )
        .join(
            vecs.withColumnsRenamed(
                {"_vid": "id_b", "_v": "_vb", "_n": "_nb"}
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.when(F.col("_na") * F.col("_nb") == 0, F.lit(0.0))
            .otherwise(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            )
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    if eager:
        from dqmtools_spark.operators.dedup import _finish_eager

        return _finish_eager(out, helpers)
    return out


def embedding_cosine_pairs_int(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[int]],
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold with integer-LSH
    bucketing (exact, oracle-reproducible candidate rule: same bucket).
    Self-join shuffles on (bucket); exact cosine verifies."""
    indexed = build_int_ann_index(df, vec_col, planes).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        "bucket",
    )
    l, r = indexed.alias("l"), indexed.alias("r")
    cand = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l._id") < F.col("r._id")),
    )
    return cand.select(
        F.col("l._id").alias("id_a"),
        F.col("r._id").alias("id_b"),
        cosine(F.col("l._v"), F.col("r._v")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


# ------------------------------------------------- quantized-IP IVF ANN
#
# IVF with inner-product coarse quantization in exact integer
# arithmetic: centroids are the n rows with the smallest
# md5(cast(id as string)) (a deterministic, engine-portable sample);
# assignment is argmax of the int64 dot product (ties -> smallest
# centroid index).  Every discrete decision (assignment, probe choice)
# is exact integer math, so a SQL oracle reproduces the candidate set
# bit-for-bit; only the final emitted cosine is floating point.
# The float k-means tier (build_ivf_index) remains the
# quality-optimized path; this tier is the verifiable one.


def build_ivf_ip_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 8,
) -> tuple[DataFrame, list[list[int]]]:
    """Quantized-IP IVF index: rows tagged with ``cluster`` (exact
    argmax of int dot vs deterministic md5-sampled centroids).
    Returns (indexed_df, centroid int vectors).  Only n_centroids
    quantized vectors ever reach the driver."""
    sample = (
        df.select(
            quantize_vec(F.col(vec_col)).alias("_q"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            F.col(id_col),
        )
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    centroids = [[int(x) for x in r["_q"]] for r in sample]
    assign = _assign_ip_udf(centroids)
    return df.withColumn("cluster", assign(F.col(vec_col))), centroids


def _assign_ip_udf(centroids: list[list[int]]):
    """pandas UDF: vector -> argmax-int-dot centroid index (exact;
    np.argmax returns the FIRST maximum = smallest index on ties,
    matching the oracle's ORDER BY dot DESC, cid ASC)."""
    c = np.asarray(centroids, dtype=np.int64)

    @F.pandas_udf(T.IntegerType())
    def assign(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        q = np.floor(mat * QUANT_SCALE).astype(np.int64)
        dots = q @ c.T  # exact: |dot| < 2^41
        return pd.Series(np.argmax(dots, axis=1).astype(np.int32))

    return assign


def ivf_ip_probe(centroids: list[list[int]], query: list[float], n_probe: int) -> list[int]:
    """Top-n_probe centroid indices by exact int dot with the query
    (ties -> smaller index), driver-side pure-Python ints."""
    import math

    qq = [math.floor(v * QUANT_SCALE) for v in query]
    scored = [
        (sum(x * w for x, w in zip(qq, c)), -i) for i, c in enumerate(centroids)
    ]
    return [-i for _, i in sorted(scored, reverse=True)[:n_probe]]


def ivf_ip_query(
    indexed: DataFrame,
    centroids: list[list[int]],
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Scan only the ``n_probe`` nearest-by-int-dot clusters, then
    exact cosine top-k within them."""
    probe = ivf_ip_probe(centroids, query, n_probe)
    cand = indexed.filter(F.col("cluster").isin(probe))
    return cosine_topk(cand, vec_col, id_col, query, k)


# ------------------------------------------------------------- IVF ANN


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 16,
    n_iters: int = 3,
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF index: deterministic k-means, rows tagged with ``cluster``.

    Returns (indexed_df, centroids).  Centroid math:

    - init: the ``n_centroids`` rows with smallest ``xxhash64(id)`` —
      a deterministic uniform sample (no random(), stable across runs
      and cluster sizes).
    - Lloyd iterations: ONE ``mapInPandas`` stage fuses assignment and
      per-partition partial sums — each task emits at most
      (n_centroids) rows of (cluster, sum_vec, count), so the shuffle
      per iteration is O(partitions x centroids x dim) scalars, not
      O(rows x dim); the final combine explodes only those partials and
      only (n_centroids x dim) numbers ever reach the driver.

    At 10^12 rows the per-iteration cost is one narrow Python stage +
    one tiny aggregate; persist the final ``indexed_df`` partitioned by
    ``cluster`` so probes prune partitions.
    """
    sample = (
        df.select(vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([list(r[vec_col]) for r in sample], dtype=np.float64)
    partial_schema = "cluster int, psum array<double>, n long"

    for _ in range(n_iters):
        partials = df.select(vec_col).mapInPandas(
            _partial_sums_fn(centroids, vec_col), schema=partial_schema
        )
        combined = (
            partials.select("cluster", "n", F.posexplode("psum"))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.sum("n").alias("ntot"))
            .collect()
        )
        for r in combined:
            centroids[r["cluster"], r["pos"]] = r["s"] / r["ntot"]

    assign = _assign_udf(centroids)
    indexed = df.withColumn("cluster", assign(F.col(vec_col)))
    return indexed, centroids


def _partial_sums_fn(centroids: np.ndarray, vec_col: str):
    """mapInPandas worker for one Lloyd round: assign each row to its
    nearest (cosine) centroid and emit per-cluster partial vector sums
    — map-side combine done in numpy, one output row per (task batch,
    cluster)."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def fn(batches):
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            normed = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            cl = np.argmax(normed @ cn.T, axis=1)
            uniq = np.unique(cl)
            yield pd.DataFrame(
                {
                    "cluster": uniq.astype(np.int32),
                    "psum": [mat[cl == k].sum(axis=0).tolist() for k in uniq],
                    "n": [int((cl == k).sum()) for k in uniq],
                }
            )

    return fn


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: vector -> nearest-centroid id (cosine, batch matmul)."""
    c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(T.IntegerType())
    def assign(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ c.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return assign


def ivf_probe(
    centroids: np.ndarray, query: list[float], n_probe: int = 4
) -> list[int]:
    """The float-IVF probe rule, driver-side: the ``n_probe`` clusters
    whose centroids are nearest the query by cosine.  Shared by
    :func:`ivf_query` and the recall benchmark."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    return [int(p) for p in np.argsort(-(cn @ qn))[:n_probe]]


def ivf_query(
    indexed: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Scan only the ``n_probe`` clusters whose centroids are nearest
    the query (cosine), then exact cosine top-k within them."""
    probe = ivf_probe(centroids, query, n_probe)
    cand = indexed.filter(F.col("cluster").isin(probe))
    return cosine_topk(cand, vec_col, id_col, query, k)
