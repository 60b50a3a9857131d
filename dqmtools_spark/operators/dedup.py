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


def word_shingles(
    text: F.Column, n: int = 3, strict: bool = False, distinct: bool = True
) -> F.Column:
    """Word n-grams (array<string>; ``distinct=False`` keeps every
    occurrence — repetition-counting consumers need multiplicity).

    Tokens are the \\S+ runs — empty strings from leading/trailing
    whitespace of ANY kind are dropped (``trim`` alone strips only
    spaces, so a newline-terminated doc would otherwise grow a phantom
    '' token and a bogus trailing-space gram that no SQL oracle
    reproduces).  ``strict=False``: docs shorter than n words fall back
    to their full token window so they still participate in
    similarity-style consumers.  ``strict=True``: such docs yield NO
    grams — the right contract for n-gram OVERLAP semantics
    (decontamination), where "shares an n-gram" must mean n real words.
    NULL text -> NULL (a null doc must never pair)."""
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    hi = (
        F.size(words) - (n - 1)
        if strict
        else F.greatest(F.size(words) - (n - 1), F.lit(1))
    )
    # sequence(1, 0) DESCENDS in Spark — an empty index list needs an
    # explicit guard for the strict short-doc case
    idx = F.when(hi >= 1, F.sequence(F.lit(1), hi)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(text.isNotNull(), grams)


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


def portable_shingle_hashes(text: F.Column, n: int, strict: bool = False) -> F.Column:
    """Engine-portable hashed word n-grams: md5_hash60(shingle) mod p
    (array<long>) — the ONE definition of the oracle-checkable shingle
    hash family, shared by the md5 MinHash tier and decontamination."""
    from dqmtools_spark.functions.hashing import P31, md5_hash60

    return F.array_distinct(
        F.transform(
            word_shingles(text, n, strict=strict), lambda s: md5_hash60(s) % P31
        )
    )


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
    sig = F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))
            )
            for i in range(num_hashes)
        ]
    )
    # null/empty shingle set -> null signature (NOT a constant): all
    # degenerate docs sharing one signature would flood a single LSH
    # bucket with an O(m^2) candidate blowup
    return F.when(F.size(shingles) > 0, sig)


def minhash_signatures(
    shingled: DataFrame,
    id_col: str,
    sh_col: str,
    num_hashes: int = 32,
    seed_hash=None,
) -> DataFrame:
    """(id, shingles) -> (id, sig array<long>) via explode + groupBy-min.

    Default hash family: :func:`minhash_signature`'s (xxhash64 over the
    (shingle, i) tuple), so signatures are bit-identical — including the
    null-signature contract for null/empty shingle sets (explode_outer
    keeps the doc's row but the guarded hash yields no values, so every
    min is null and the signature folds to null; without the guard,
    ``xxhash64(null, seed)`` hashes the seed alone and all degenerate
    docs share one constant signature, flooding a single LSH bucket).
    ``seed_hash(col, i) -> Column`` swaps the family (the md5 tier
    passes Carter–Wegman arithmetic over pre-hashed shingles).
    The 32 mins run as ONE whole-stage-codegen hash aggregate instead
    of 32 interpreted array passes.  Scale shape: a doc's shingles sit
    in one input row, so map-side partial aggregation collapses back to
    one row per doc before the exchange — the shuffle is O(docs), not
    O(shingles)."""
    fam = seed_hash or (lambda c, i: F.xxhash64(c, F.lit(i)))
    ex = shingled.select(F.col(id_col), F.explode_outer(sh_col).alias("_s"))
    mins = [
        F.min(F.when(F.col("_s").isNotNull(), fam(F.col("_s"), i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.when(
                F.col("_h0").isNotNull(),
                F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]),
            ).alias("_sig"),
        )
    )


def _parallelize_input(df: DataFrame) -> DataFrame:
    """Small-scan guard for explode-heavy operators: a tiny
    single-row-group parquet (or any source with fewer splits than the
    cluster has slots) would run the expensive per-doc map work
    (tokenize / shingle / hash / explode) nearly single-threaded —
    measured 4-5s single-core vs sub-second spread on the sf0.1
    documents table.  Repartition up to defaultParallelism first: at
    production scale inputs carry >= cluster-slots splits and this is
    a NO-OP (no exchange inserted); on small inputs the shuffle it
    inserts moves only the raw pre-explode rows.  Streaming frames
    pass through untouched (their micro-batch partitioning is the
    source's concern)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _finish_eager(out: DataFrame, helpers: list[DataFrame]) -> DataFrame:
    """Cache-hygiene epilogue for the LSH pair functions: materialize
    the (small) pair result into its own cache, then unpersist every
    intermediate helper frame (shingle/signature tables, O(docs)-sized)
    so repeated dedup passes in a long-lived session do not accumulate
    pinned blocks.  The caller owns the returned frame's cache —
    ``out.unpersist()`` when done leaves the session cache empty
    (asserted by ``tests/test_cache_hygiene.py``)."""
    from pyspark import StorageLevel

    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    for h in helpers:
        h.unpersist()
    return out


def _lsh_band_verify(
    base: DataFrame,
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    hash_buckets: bool,
) -> DataFrame:
    """Shared LSH core: band the signatures, self-join on the band
    bucket, verify candidates with exact Jaccard over the shingle sets.

    ``base`` = (_id, _sh) shingle table (persisted by the caller —
    verify reads it twice); ``sigs`` = (_id, _sig) with null signatures
    already filtered, persisted by the caller (both sides of the banded
    self-join read it — without a persist the minhash aggregate runs
    twice).  ``hash_buckets=True`` joins on
    ``xxhash64(slice)`` (compact shuffle key, Spark-only);
    ``False`` joins on the raw slice (array equi-join — exactly "some
    band agrees", reproducible in oracle SQL).  Both are equi-joins:
    never cartesian, AQE splits hot buckets.
    """
    rows_per_band = num_hashes // bands

    def bucket(b: int) -> F.Column:
        sl = F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
        return F.xxhash64(sl) if hash_buckets else sl

    banded = sigs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("val"))
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_b.band", "_b.val")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )

    sh = base.select("_id", "_sh")
    return (
        cand.join(
            sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        # raw, not rounded: one exact int/int division is bit-identical
        # in every engine, so an oracle needs no rounding fuzz
        .select("id_a", "id_b", "jaccard")
    )


def minhash_bands_for_recall(
    threshold: float, rows_per_band: int, target_recall: float = 0.9
) -> int:
    """MinHash band count: a pair at Jaccard exactly ``threshold``
    agrees on one minhash with probability s = threshold, so the
    shared OR-construction rule
    (:func:`~dqmtools_spark.operators.similarity.or_construction_bands`)
    applies with p = s.  The default production parameters (b=8, r=4)
    give measured recall 0.567/0.800/0.983/1.0/1.0 across Jaccard
    0.5..1.0 buckets (BENCH §14, tracking this formula); to dedup
    aggressively at a LOWER threshold raise b (more parallel OR-trials;
    num_hashes = b*r grows with it), never lower the verify
    threshold."""
    from dqmtools_spark.operators.similarity import or_construction_bands

    return or_construction_bands(threshold, rows_per_band, target_recall)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    persist_shingles: bool = True,
    eager: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    bands=8 x rows=4 over 32 hashes -> collision prob ~ s^4 per band;
    s=0.8 gives ~97% recall.  Shuffle plan: one exchange to bucket-join
    on (band, band_hash), one to verify (shingles re-joined by id).
    Null signatures (null/empty shingle set) are dropped BEFORE banding
    — a null slice would hash to a constant bucket and pair every
    degenerate doc with every other.

    PERSISTS the shingle table (unless ``persist_shingles=False``) and
    the signature table (O(docs)-sized) for the duration of the
    returned frame's computation.  ``eager=True`` materializes the
    (small) pair result into its own cache and unpersists both helpers
    before returning — the hygienic form for long-lived sessions; the
    caller unpersists the result when done.  ``eager=False`` leaves the
    helpers pinned until ``spark.catalog.clearCache()`` (lazy plan
    shape, used by plan audits).
    """
    from pyspark import StorageLevel

    df = _parallelize_input(df)
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingle_hashes(F.col(text_col), n).alias("_sh"),
    )
    helpers = []
    if persist_shingles:
        # the shingle table feeds three consumers (signatures + both
        # sides of the verify join); persisting trades memory/disk for
        # 2 recomputes of the shingling pass over the corpus
        base = base.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(base)
    sigs = minhash_signatures(base, "_id", "_sh", num_hashes).filter(
        F.col("_sig").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    helpers.append(sigs)
    out = _lsh_band_verify(
        base, sigs, num_hashes, bands, threshold, hash_buckets=True
    )
    return _finish_eager(out, helpers) if eager else out


def minhash_lsh_pairs_md5(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    eager: bool = False,
) -> DataFrame:
    """Oracle-checkable MinHash LSH: identical banding/verify shape to
    :func:`minhash_lsh_pairs`, but every hash is engine-portable so a
    DuckDB differential oracle can verify the FULL output:

    - shingle hash: ``md5_hash60(shingle) mod p`` (md5 is bit-identical
      in every engine; see ``functions/hashing.py``),
    - per-seed minhash: Carter–Wegman ``(a_i*x + b_i) mod p`` — pure
      exact int64 arithmetic,
    - band bucket: the raw slice of the signature array as the join
      key (array equi-join) — no bucket-hash, so candidate semantics
      are exactly "some band agrees", reproducible as
      ``sig_a[lo:hi] = sig_b[lo:hi] OR ...`` in SQL,
    - verify: exact Jaccard over the hashed shingle sets (integer set
      ops; the emitted double is one exact division).

    Same scale shape as the xxhash64 tier — both are thin wrappers over
    the shared :func:`_lsh_band_verify` core (signatures via ONE
    codegen hash aggregate in :func:`minhash_signatures`, banded
    equi-join, no all-pairs path).  ~2x more per-row hash cost than
    xxhash64 (md5) — the xxhash64 tier remains the default at scale;
    this tier is the verifiable one.

    PERSISTS the shingle and signature tables; ``eager=True`` swaps
    them for a cache of the (small) pair result before returning (see
    :func:`minhash_lsh_pairs`).
    """
    from pyspark import StorageLevel

    from dqmtools_spark.functions.hashing import P31, universal_hash_consts

    consts = universal_hash_consts(num_hashes)
    df = _parallelize_input(df)
    sh = portable_shingle_hashes(F.col(text_col), n)
    base = df.select(F.col(id_col).alias("_id"), sh.alias("_sh")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cw = lambda c, i: (F.lit(consts[i][0]) * c + F.lit(consts[i][1])) % P31  # noqa: E731
    sigs = minhash_signatures(base, "_id", "_sh", num_hashes, seed_hash=cw).filter(
        F.col("_sig").isNotNull()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out = _lsh_band_verify(
        base, sigs, num_hashes, bands, threshold, hash_buckets=False
    )
    return _finish_eager(out, [base, sigs]) if eager else out


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

    The convergence probe is folded into the round's own frame: the
    changed flag is projected alongside the new label, so detecting
    convergence is one tiny scan of the already-materialized checkpoint
    — no extra join re-reading both label frames per round.

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iters`` rounds (a silent partial result would keep multiple
    representatives of one cluster downstream); long chains at corpus
    scale need a larger ``max_iters`` (rounds scale with the LOG of the
    worst diameter once doubling is added; here diameter rounds).
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
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        new_comp = F.least(
            F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                new_comp.alias("component"),
                (new_comp != F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.select("id", "component")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "a component's diameter exceeds max_iters — raise max_iters"
        )
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


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """(id, text) -> (id, sig) n_bits-bit SimHash, entirely JVM-side.

    Same explode + hash-aggregate shape as :func:`minhash_signatures`:
    distinct token hashes explode to rows, ``n_bits`` per-bit vote sums
    run as ONE whole-stage-codegen aggregate (map-side partials
    collapse back to one row per doc before the exchange), and the
    signature assembles with a bitwiseOR chain.  Vote semantics match
    :func:`simhash64_udf` (tie -> bit set; empty token set -> 0;
    null text -> null).

    ``token_hash`` picks the token hash family: default ``xxhash64``
    (fastest, Spark-only); pass ``hashing.md5_hash60`` with
    ``n_bits=60`` for the engine-portable family a DuckDB oracle can
    reproduce bit-for-bit.
    """
    hash_fn = token_hash or F.xxhash64
    df = _parallelize_input(df)
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
    )  # split("") yields [""] — drop it so empty text means zero tokens
    toks = F.array_distinct(F.transform(words, lambda w: hash_fn(w)))
    ex = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("_has"),
        F.explode_outer(toks).alias("_h"),
    )
    one = F.lit(1).cast("long")
    # per-bit vote sum(+1/-1 over tokens) = 2*sum(bit_i) - n_tokens, so
    # aggregating the raw bit (one shift+and per bit, no CASE) and
    # comparing 2*s_i >= n gives bit-identical signatures at about half
    # the per-row expression cost of the +-1 CASE form
    votes = [
        F.sum(F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(one)).alias(f"_v{i}")
        for i in range(n_bits)
    ]
    agg = ex.groupBy(id_col).agg(
        F.max("_has").alias("_has"), F.count("_h").alias("_n"), *votes
    )
    sig = F.lit(0).cast("long")
    for i in range(n_bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") * 2 >= F.col("_n"), F.shiftleft(one, i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(
        F.col(id_col),
        F.when(~F.col("_has"), F.lit(None).cast("long"))
        .when(F.col("_n") == 0, F.lit(0).cast("long"))
        .otherwise(sig)
        .alias("_sig"),
    )


def band_boundaries(n_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Partition bit positions [0, n_bits) into ``n_bands`` contiguous
    (offset, width) bands; the first ``n_bits % n_bands`` bands get the
    extra bit.  Together the bands cover every bit exactly once — the
    pigeonhole precondition."""
    base, extra = divmod(n_bits, n_bands)
    out, off = [], 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        out.append((off, w))
        off += w
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
    n_bits: int = 64,
    token_hash=None,
    eager: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole banding: with ``n_bands > max_hamming`` bands partitioning
    the signature's bits, any pair within Hamming ``max_hamming`` has at
    least one band with zero differing bits, so it agrees exactly on
    that band — candidates come from ``n_bands`` band-equijoins (shuffle
    on the band value), then bit_count verifies.  No all-pairs
    comparison, and recall is exactly 1.0 (every <=max_hamming pair is
    emitted).  ``n_bands`` defaults to ``max(4, max_hamming + 1)``; an
    explicit smaller value raises, because ``n_bands <= max_hamming``
    silently loses the recall guarantee.
    """
    if n_bands is None:
        n_bands = max(4, max_hamming + 1)
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} <= max_hamming={max_hamming}: pigeonhole "
            "recall guarantee requires n_bands > max_hamming"
        )
    sig = simhash_signatures(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)),
        "_id",
        text_col,
        n_bits=n_bits,
        token_hash=token_hash,
    )
    # the signature table feeds BOTH sides of the banded self-join;
    # without a persist the token-explode + n_bits-sum aggregate runs
    # twice.  The cached table is O(docs x 8B) — negligible at any
    # scale next to recomputing the signature pass.  eager=True swaps
    # it for a cache of the (small) pair result before returning.
    from pyspark import StorageLevel

    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    bounds = band_boundaries(n_bits, n_bands)
    bands = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), off)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for b, (off, width) in enumerate(bounds)
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
    out = (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _finish_eager(out, [sig]) if eager else out


# -------------------------------------- cross-doc repeated n-gram spans


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
    persist_grams: bool = True,
    eager: bool = False,
) -> DataFrame:
    """ExactSubstr-style repeated-span SIGNAL (Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better", the
    n-gram-hash approximation of its suffix-array substring dedup):
    per document, how many of its ``n``-word gram POSITIONS (with
    multiplicity) carry a gram that also occurs in at least
    ``min_docs`` DISTINCT documents corpus-wide.

    Output: (id, n_grams, n_dup_grams, dup_fraction) — the fraction a
    repeated-span filter thresholds on.  Docs with fewer than ``n``
    words emit no grams and no row (strict contract, same as
    decontamination's).

    Plan shape at scale: gram hashes are computed map-side
    (:func:`word_shingles` strict + multiplicity, md5/mod-p portable
    family — the ONE oracle-checkable hash family); the corpus-wide
    exchange carries (gram, doc) pairs ONCE for the distinct-doc
    count (same O(corpus grams) class as :func:`global_line_dedup`,
    AQE splits hot grams) and the hot-gram set comes back as a
    broadcast-able join on the gram key — never a cartesian.  The
    per-doc totals aggregate map-side.

    The gram table feeds exactly TWO consumers — the corpus-wide
    distinct-doc count and a single marker-join + per-doc aggregate
    that produces ``n_grams`` and ``n_dup_grams`` in ONE pass (a
    left join to the hot set followed by ``count`` /
    ``count(marker)``, instead of separate total/dup aggregates that
    would scan the corpus a third time).  ``persist_grams`` trades
    memory/disk for recomputing the tokenize+hash pass for the second
    consumer — same discipline as ``persist_shingles`` in
    :func:`minhash_lsh_pairs`; ``eager=True`` materializes the (small,
    one-row-per-doc) result and unpersists the gram table.  As with
    the LSH ops, ``eager=False`` with ``persist_grams=True`` leaves the
    helper pinned until ``spark.catalog.clearCache()`` — in a
    long-lived session either pass ``eager=True`` or
    ``persist_grams=False``.
    """
    from pyspark import StorageLevel

    from dqmtools_spark.functions.hashing import P31, md5_hash60

    df = _parallelize_input(df)
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(F.col(text_col), n, strict=True, distinct=False),
                lambda s: md5_hash60(s) % P31,
            )
        ).alias("gh"),
    )
    helpers = []
    if persist_grams:
        grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(grams)
    hot = (
        grams.dropDuplicates([id_col, "gh"])
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gh", F.lit(1).alias("_hot"))
    )
    out = (
        grams.join(hot, "gh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.col("_hot")).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6),
        )
    )
    return _finish_eager(out, helpers) if eager else out


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
    min_span_chars: int = 0,
    persist_covered: bool = True,
    persist_grams: bool = True,
    eager: bool = False,
) -> DataFrame:
    """ExactSubstr-style repeated-span REMOVAL (the rewrite step of Lee
    et al. 2022 that :func:`duplicated_ngram_spans` only scores): drop
    every token position covered by a hot ``n``-gram (one carried by
    >= ``min_docs`` DISTINCT documents) and rebuild the text from the
    surviving tokens.  The rebuild is token-level — surviving tokens
    are re-joined with single spaces, so runs of whitespace normalize
    (web corpora after extraction are single-spaced; the byte-identity
    contract belongs to scrub, not to span removal).

    Output, one row per non-null-text doc: (id, n_tokens, n_removed,
    removed_fraction, clean_text).  Docs with < ``n`` words emit no
    grams and pass through unchanged; a fully-duplicated doc comes
    back with ``clean_text = ''``.

    ``min_span_chars`` > 0 enables MAXIMAL-span semantics (the actual
    Lee et al. 2022 rule — they remove duplicated substrings of
    >= 50 chars): adjacent/overlapping hot-gram token positions merge
    into maximal spans (gaps-and-islands over covered positions), and
    only spans whose rejoined char length (token lengths + single-space
    gaps) reaches the threshold are removed — two short scattered
    n-grams no longer count as duplication, a long boilerplate run
    does.  The default 0 removes every covered position (fixed-n gram
    coverage) with no extra shuffle.

    Plan shape at scale: the hot-gram detection is the SAME
    O(corpus grams) exchange as the signal op.  The expensive part —
    exploding tokens to rebuild text — runs ONLY for documents that
    actually contain a duplicated span (a semi-join routes them);
    clean documents re-join their token array map-side with zero extra
    shuffle.  On web corpora where a few percent of docs carry
    boilerplate spans, the rebuild shuffle is a few percent of corpus
    tokens, not all of them.

    ``covered`` (the O(dup tokens) hot-position table, small relative
    to the corpus) feeds three consumers (the dup-doc router's semi and
    anti sides plus the kept-token anti-join); ``persist_covered``
    trades memory/disk for recomputing the whole gram->hot pipeline per
    consumer — same discipline as the LSH signature tables.  The gram
    table itself feeds two consumers (the hot-gram count and the
    covered-position join); ``persist_grams`` avoids tokenizing+hashing
    the corpus twice for them, at the cost of caching an
    O(corpus gram positions) frame — on a cluster with tight executor
    memory prefer ``persist_grams=False`` (recompute) over spilling.
    ``eager=True`` materializes the result and unpersists the helpers
    (cache-hygiene epilogue; note the result carries full rebuilt text,
    so at sink scale prefer ``eager=False`` + write + then
    ``spark.catalog.clearCache()`` — with ``eager=False`` the persisted
    helpers have no caller-visible handle and stay pinned until the
    cache is cleared; pass ``persist_*=False`` to avoid pinning
    entirely).
    """
    from pyspark import StorageLevel

    from dqmtools_spark.functions.hashing import P31, md5_hash60

    df = _parallelize_input(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), words.alias("ws")
    )

    helpers = []
    grams = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                word_shingles(F.col(text_col), n, strict=True, distinct=False),
                lambda s: md5_hash60(s) % P31,
            )
        ).alias("s", "gh"),
    )
    if persist_grams:
        grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(grams)
    hot = (
        grams.dropDuplicates([id_col, "gh"])
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    # token positions (0-based) covered by some hot gram start s
    covered = (
        grams.join(hot, "gh")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(n - 1))
            ).alias("p"),
        )
        .dropDuplicates([id_col, "p"])
    )
    if persist_covered:
        covered = covered.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(covered)

    dup_ids = covered.select(id_col).distinct()
    dup_docs = base.join(dup_ids, id_col, "semi")
    clean_docs = base.join(dup_ids, id_col, "anti")

    toks = dup_docs.select(F.col(id_col), F.posexplode("ws").alias("p", "tok"))
    if min_span_chars > 0:
        # gaps-and-islands: adjacent covered positions share
        # p - row_number(); each island is one maximal span.  The
        # window shuffles only the covered positions (O(dup tokens),
        # small vs the corpus), keyed by doc id — no skew beyond a
        # single pathological doc, which AQE handles.
        from pyspark.sql import Window

        # toks feeds two consumers in maximal-span mode (the island
        # char-length computation and the kept anti-join); persist so
        # the dup-doc semi-join + token explode runs once
        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
        helpers.append(toks)
        # ONE pass over the covered tokens: island id via the
        # gaps-and-islands window, per-island rejoined char length via
        # a second window over (id, grp), filter, done — no separate
        # groupBy + semi-join re-derivation of the islands frame
        w_isl = Window.partitionBy(id_col).orderBy("p")
        w_grp = Window.partitionBy(id_col, "grp")
        removed = (
            covered.join(toks, [id_col, "p"])
            .withColumn("grp", F.col("p") - F.row_number().over(w_isl))
            .withColumn(
                "chars",
                F.sum(F.length("tok")).over(w_grp)
                + F.count(F.lit(1)).over(w_grp)
                - 1,
            )
            .filter(F.col("chars") >= min_span_chars)
            .select(id_col, "p")
        )
    else:
        removed = covered
    kept = toks.join(removed, [id_col, "p"], "anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    dup_out = (
        dup_docs.select(F.col(id_col), F.size("ws").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
    clean_out = clean_docs.select(
        F.col(id_col),
        F.size("ws").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),
        F.concat_ws(" ", "ws").alias("clean_text"),
    )
    out = dup_out.unionByName(clean_out).select(
        F.col(id_col),
        "n_tokens",
        "n_removed",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_removed") / F.col("n_tokens"), 6))
        .alias("removed_fraction"),
        "clean_text",
    )
    # eager materialization runs regardless of which helpers were
    # persisted (an eager=True, persist_*=False caller still gets a
    # materialized frame back — ADVICE r4 flagged the silent lazy plan)
    return _finish_eager(out, helpers) if eager else out


# ------------------------------------------ corpus-global line dedup


def word_chunks(text: F.Column, chunk: int = 4) -> F.Column:
    """Deterministic ``chunk``-word 'lines' (array<string>) for
    single-line corpora — the shared line-derivation used by BOTH the
    corpus-global line dedup and the duplicate-line-fraction queries
    (and mirrored SQL-side by ``oracles.word_chunks_sql``): keeping it
    in one place is what makes their 'same line form' docstring claims
    structurally true rather than copy-paste-true."""
    ws = F.split(text, " ")
    return F.transform(
        F.sequence(F.lit(1), F.size(ws), F.lit(chunk)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(chunk))),
    )


def global_line_dedup(
    df: DataFrame, text_col: str, id_col: str, min_chars: int = 1
) -> DataFrame:
    """C4-style GLOBAL line deduplication (Raffel et al. 2020 §2.2
    discard repeated spans, applied at line granularity as CCNet/
    RefinedWeb do): across the WHOLE corpus, a line survives only at
    its FIRST occurrence — first = smallest (id, line_index) — and each
    document is reassembled from its surviving lines in original order.
    Complements :func:`~dqmtools_spark.functions.textstats.
    dedup_repeated_lines`, which is intra-document/per-row only.

    Returns (id_col, deduped_text, n_kept).  A document whose every
    line occurred earlier comes back with ``deduped_text=''`` and
    ``n_kept=0`` (C4 then drops such docs via the length rule).  Lines
    shorter than ``min_chars`` are exempt (always kept): the default 1
    exempts only empty lines, so blank-line structure survives.
    NULL-text docs also return ('', 0).

    Scale shape — the canonical global span-dedup plan, all rows
    O(corpus lines), no all-pairs anything:
      1. posexplode lines, key = md5(line) (narrow 32-byte shuffle key
         instead of the raw line; md5 keeps the oracle portable),
      2. winner per key = ``min(struct(id, idx))`` — ONE hash aggregate
         with map-side partial combine,
      3. broadcast-free equi-join lines->winners on the hash,
      4. one groupBy(id) to reassemble (sorted by line index).
    Deterministic across runs and cluster sizes: winners are pure mins.
    """
    out, _winners = global_line_dedup_frames(df, text_col, id_col, min_chars)
    return out


def global_line_dedup_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_chars: int = 1,
    seen_hashes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The shared core of batch AND incremental global line dedup:
    returns ``(out, winners)`` where ``out`` is the
    (id, deduped_text, n_kept) result and ``winners`` the one-row-per-
    newly-kept-line-hash frame (column ``_h``) — the increment a
    streaming ledger appends.

    ``seen_hashes`` (a frame with column ``_h``) excludes lines the
    corpus has ALREADY kept (prior micro-batches): they get no winner
    row and are dropped by the same null filter that drops
    within-corpus later occurrences.  ``None`` (the batch form) means
    nothing is pre-seen.  Keeping one definition is what makes the
    streaming twin (:func:`~dqmtools_spark.streaming.stream.
    stream_global_line_dedup`) EQUAL to the batch operator by
    construction, not by parallel maintenance of two copies.
    """
    df = _parallelize_input(df)
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("_idx", "_line"),
    ).withColumn("_h", F.md5(F.col("_line")))
    fresh = ex.filter(F.length("_line") >= min_chars)
    if seen_hashes is not None:
        fresh = fresh.join(seen_hashes.select("_h"), "_h", "anti")
    winners = fresh.groupBy("_h").agg(
        F.min(F.struct("_id", "_idx")).alias("_w")
    )
    kept = ex.join(winners, "_h", "left").filter(
        (F.length("_line") < min_chars)
        | ((F.col("_w._id") == F.col("_id")) & (F.col("_w._idx") == F.col("_idx")))
    )
    docs = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("deduped_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    out = (
        df.select(F.col(id_col).alias("_id"))
        .join(docs, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("deduped_text", F.lit("")).alias("deduped_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
    return out, winners


# ------------------------------------------- embedding-cosine near-dup


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int | None = 8,
    seed: int = 42,
    expected_rows: int | None = None,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Candidate generation is the hyperplane-LSH bucket (same signature
    family as ANN search): only rows sharing a sign-pattern bucket are
    compared, so the self-join shuffles on (bucket) instead of
    exploding all pairs.  Exact cosine (JVM-side
    ``aggregate(zip_with(...))``) verifies every candidate — no false
    positives.  RECALL of this single-bucket (AND-only) construction
    is the per-plane collision probability to the n_planes power:
    (1 - theta/pi)^n — e.g. ~0.43 at cosine 0.95 with 8 planes, and
    measured 0.3% at threshold 0.35 with 12 planes (BENCH §15) — so
    treat it as a high-precision prefilter; for measured-recall
    near-dup detection use the banded OR-construction
    (:func:`~dqmtools_spark.operators.similarity.
    embedding_cosine_pairs_int_banded`, 90%+ measured at its design
    target) or run several seeds of this function and union.

    SCALE: intra-bucket comparison is quadratic in bucket occupancy, so
    ``n_planes`` must grow with the corpus (log2) — pass
    ``n_planes=None`` with ``expected_rows`` to derive it via
    :func:`~dqmtools_spark.operators.similarity.n_planes_for_corpus`
    (SCALE.md "Embedding LSH plane-count scaling").

    Semantics analog: the reference's near-identical-stream checks
    compare per-channel signatures rather than raw waveforms
    (SURVEY §2.3 A1-A5); here the signature is the LSH bucket.
    """
    from dqmtools_spark.operators.similarity import build_ann_index, cosine

    indexed = build_ann_index(
        df,
        vec_col,
        dim,
        n_planes=n_planes,
        seed=seed,
        expected_rows=expected_rows,
        target_bucket_rows=target_bucket_rows,
    ).select(
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
