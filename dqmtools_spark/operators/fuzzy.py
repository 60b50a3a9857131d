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
) -> DataFrame:
    """(id_a, id_b, dist) for every same-block pair with
    ``levenshtein(key_a, key_b) <= max_dist`` (id_a < id_b).

    ``key``: the string compared (keep it short — a prefix or a title
    field, not a whole document).  ``block``: the candidate-generation
    key; rows in different blocks are never compared.
    """
    p = df.select(
        F.col(id_col), block.alias("_blk"), key.alias("_key")
    ).filter(F.col("_blk").isNotNull() & F.col("_key").isNotNull())
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a._key"), F.col("b._key"), max_dist)
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") >= 0)  # threshold form returns -1 past it
    )
