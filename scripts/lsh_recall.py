"""MinHash-LSH recall vs exact Jaccard (the text-dedup twin of
scripts/ann_recall.py).

Ground truth: exact Jaccard over the SAME hashed 3-word shingle sets
the operator uses (collected from the Spark derivation, so there is no
tokenization drift), all pairs over a capped doc slice.  Measured:
``minhash_lsh_pairs_md5`` with the production parameters
(32 hashes, 8 bands x 4 rows, threshold 0.5) — the operator verifies
candidates with exact Jaccard, so precision is 1.0 by construction and
the interesting number is RECALL per true-Jaccard bucket, which theory
predicts as the banding S-curve P(s) = 1 - (1 - s^4)^8.

Usage: python scripts/lsh_recall.py [--max-docs 2000]
Prints one JSON line + a per-bucket markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def planted_pairs_df(spark, pairs_per_bucket: int = 60, doc_words: int = 62):
    """Deterministic doc pairs with CONTROLLED 3-gram Jaccard: each
    pair shares a prefix of s words and is unique elsewhere (tokens
    are globally unique per pair), so J = (s-2) / (2*(L-2) - (s-2))
    exactly.  s is swept so true Jaccard lands across the 0.5-1.0
    buckets — the region where the banding S-curve bends."""
    rows = []
    doc_id = 0
    L = doc_words
    targets = [0.55, 0.62, 0.68, 0.75, 0.85, 0.95]
    for t_i, j_target in enumerate(targets):
        # invert J=(s-2)/(2(L-2)-(s-2))  ->  s = 2 + J*2*(L-2)/(1+J)
        s = round(2 + j_target * 2 * (L - 2) / (1 + j_target))
        for k in range(pairs_per_bucket):
            tag = f"{t_i}_{k}"
            shared = [f"s{tag}w{i}" for i in range(s)]
            a = shared + [f"a{tag}w{i}" for i in range(L - s)]
            b = shared + [f"b{tag}w{i}" for i in range(L - s)]
            rows.append((doc_id, " ".join(a)))
            rows.append((doc_id + 1, " ".join(b)))
            doc_id += 2
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-docs", type=int, default=2000)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--planted", action="store_true",
                    help="measure on deterministic controlled-Jaccard "
                         "pairs instead of the sf documents table")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dqmtools_spark.operators.dedup import (
        minhash_lsh_pairs_md5,
        portable_shingle_hashes,
    )
    from dqmtools_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(app_name="lsh_recall", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if args.planted:
        d = planted_pairs_df(spark)
    else:
        d = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < args.max_docs)
            .select("doc_id", "text")
        )

    # hashed shingle sets straight from the operator's own derivation
    sets = {
        int(r["doc_id"]): frozenset(r["sh"])
        for r in d.select(
            "doc_id", portable_shingle_hashes(F.col("text"), 3).alias("sh")
        ).collect()
        if r["sh"]
    }

    # exact all-pairs Jaccard (driver-side; bounded by --max-docs)
    truth: dict[tuple[int, int], float] = {}
    ids = sorted(sets)
    for a, b in combinations(ids, 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if inter == 0:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= args.threshold:
            truth[(a, b)] = j

    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs_md5(
            d, "text", "doc_id", n=3, threshold=args.threshold, eager=True
        ).collect()
    }

    false_pos = got - set(truth)
    buckets = [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)]
    rows = []
    for lo, hi in buckets:
        in_b = [p for p, j in truth.items() if lo <= j < hi]
        hit = sum(1 for p in in_b if p in got)
        # analytic banding curve at the bucket midpoint: 1-(1-s^4)^8
        s = (lo + min(hi, 1.0)) / 2
        pred = 1 - (1 - s**4) ** 8
        rows.append(
            {
                "jaccard": f"{lo:.1f}-{min(hi, 1.0):.1f}",
                "true_pairs": len(in_b),
                "found": hit,
                "recall": round(hit / len(in_b), 3) if in_b else None,
                "predicted": round(pred, 3),
            }
        )
    overall = round(len(got & set(truth)) / max(len(truth), 1), 4)
    print(
        json.dumps(
            {
                "metric": "minhash_lsh_recall",
                "overall_recall": overall,
                "true_pairs": len(truth),
                "lsh_pairs": len(got),
                "false_positives": len(false_pos),
                "docs": len(ids),
                "threshold": args.threshold,
                "params": {"n": 3, "num_hashes": 32, "bands": 8, "rows": 4},
                "buckets": rows,
            }
        )
    )
    print("\n| true Jaccard | pairs | found | recall | banding-theory |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['jaccard']} | {r['true_pairs']} | {r['found']} "
            f"| {r['recall']} | {r['predicted']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
