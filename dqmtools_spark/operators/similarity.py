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
    df: DataFrame, vec_col: str, n_planes: int = 12, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """Attach a deterministic LSH ``bucket`` column.  At scale, persist
    partitioned/bucketed by this column so probes prune partitions."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket_udf = hyperplane_bucket_udf(dim, n_planes, seed)
    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


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
    """Approximate top-k: score only rows in the query's bucket and the
    ``n_probes`` nearest multiprobe buckets (single-bit flips of the
    planes with smallest |projection| — the least confident signs)."""
    q = np.asarray(query, dtype=np.float64)
    planes = _planes(len(query), n_planes, seed)
    proj = q @ planes
    base = int(((proj >= 0) @ (1 << np.arange(n_planes))))
    flips = np.argsort(np.abs(proj))[: max(n_probes - 1, 0)]
    buckets = [base] + [base ^ (1 << int(i)) for i in flips]

    cand = indexed.filter(F.col("bucket").isin(buckets))
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
    - Lloyd iterations: assignment is a numpy matmul inside a pandas
      UDF (centroids closed over, one BLAS call per Arrow batch);
      centroid update is ``posexplode`` + ``groupBy(cluster, dim).avg``
      — a shuffle of O(rows x dim) scalars with map-side combine, and
      only (n_centroids x dim) numbers ever reach the driver.

    At 10^12 rows the per-iteration cost is one narrow Python stage +
    one aggregate; persist the final ``indexed_df`` partitioned by
    ``cluster`` so probes prune partitions.
    """
    sample = (
        df.select(vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([list(r[vec_col]) for r in sample], dtype=np.float64)

    for _ in range(n_iters):
        assign = _assign_udf(centroids)
        assigned = df.select(
            F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster")
        )
        dims = assigned.select(
            "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
        )
        new = (
            dims.groupBy("cluster", "pos")
            .agg(F.avg("col").alias("v"))
            .collect()
        )
        for r in new:
            centroids[r["cluster"], r["pos"]] = r["v"]

    assign = _assign_udf(centroids)
    indexed = df.withColumn("cluster", assign(F.col(vec_col)))
    return indexed, centroids


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
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probe = np.argsort(-(cn @ qn))[:n_probe]
    cand = indexed.filter(F.col("cluster").isin([int(p) for p in probe]))
    return cosine_topk(cand, vec_col, id_col, query, k)
