"""Blocked fuzzy matching: near-duplicate pairs by edit distance
within deterministic blocks.

The record-linkage primitive (near-identical titles, URLs, short
fields) the n-gram tiers don't cover: Jaccard on word sets ignores
character-level typos, while Levenshtein sees them — but an all-pairs
Levenshtein is O(n^2 · L^2), so candidates are first BLOCKED on a
cheap deterministic key (first token, length bucket, phonetic code…)
and the quadratic cost is confined within blocks, exactly the LSH-tier
discipline used by `operators/dedup.py` (block key choice bounds the
bucket size; the join is an equi-join on the block, never cartesian).

Spark's ``levenshtein(l, r, threshold)`` form prunes the DP early
(returns -1 past the threshold), so the per-pair cost is
O(threshold · L) rather than O(L^2).  Distances are integers, BUT the
unit differs across engines: Spark edits CODEPOINTS while DuckDB's
``levenshtein`` edits BYTES, so they agree only on ASCII keys.  The
operator itself is codepoint-correct for any input; the oracle-paired
query (``q_fuzzy_prefix_pairs``) therefore restricts its keys to
ASCII on BOTH sides (``\\p{ASCII}`` / ``[[:ascii:]]`` guards) — on
non-ASCII corpora use the operator directly and validate with a
same-engine reference instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    key: Column,
    block: Column,
    id_col: str,
    max_dist: int,
    max_block: int | None = 10_000,
) -> DataFrame:
    """(id_a, id_b, dist) for every same-block pair with
    ``levenshtein(key_a, key_b) <= max_dist`` (id_a < id_b).

    ``key``: the string compared (keep it short — a prefix or a title
    field, not a whole document).  ``block``: the candidate-generation
    key; rows in different blocks are never compared.

    Hot-block guard (``max_block``): a degenerate block key (first
    token "the" on English titles) makes one block quadratic — a
    straggler-killer at corpus scale.  Blocks holding more than
    ``max_block`` rows are therefore salt-SPLIT by a secondary
    length-bucket key of width ``max_dist + 1``.  This loses NOTHING:
    edit distance >= |len(a) - len(b)|, so any qualifying pair differs
    in length by at most ``max_dist`` < bucket width and lands in the
    same or an adjacent bucket; the b-side of hot blocks is replicated
    into its three neighbouring buckets, and each qualifying pair
    matches exactly one replica (recall exactly 1.0, no dedup step).
    Per-pair candidate cost in a hot block of H rows drops from H to
    ~3·H/n_buckets.  The candidate join stays a pure equi-join on
    (block, bucket) — never a range or theta join.  The hot-block list
    itself is broadcast: it has at most n_rows/max_block entries by
    construction.  ``max_block=None`` disables the guard (and the
    extra count aggregation) entirely.
    """
    p = df.select(
        F.col(id_col), block.alias("_blk"), key.alias("_key")
    ).filter(F.col("_blk").isNotNull() & F.col("_key").isNotNull())

    if max_block is None:
        a_side, b_side = p.alias("a"), p.alias("b")
    else:
        width = max_dist + 1
        hot = (
            p.groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("_cnt") > max_block)
            .select("_blk", F.lit(True).alias("_hot"))
        )
        flagged = p.join(F.broadcast(hot), "_blk", "left")
        bucket = F.when(
            F.col("_hot"), F.floor(F.length("_key") / width)
        ).otherwise(F.lit(0))
        a_side = flagged.withColumn("_bkt", bucket.cast("long")).drop(
            "_hot"
        ).alias("a")
        b_side = flagged.withColumn(
            "_bkt",
            F.explode(
                F.when(
                    F.col("_hot"),
                    F.array(bucket - 1, bucket, bucket + 1),
                ).otherwise(F.array(F.lit(0).cast("long")))
            ),
        ).drop("_hot").alias("b")

    dist = F.levenshtein(F.col("a._key"), F.col("b._key"), max_dist)
    cond = (F.col("a._blk") == F.col("b._blk")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if max_block is not None:
        cond = cond & (F.col("a._bkt") == F.col("b._bkt"))
    return (
        a_side.join(b_side, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") >= 0)  # threshold form returns -1 past it
    )
