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
