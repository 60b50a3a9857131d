"""ANN recall@k vs scan-cost benchmark (VERDICT r4 item 5).

Measures, on the sf embeddings table, the recall/cost trade-off of the
three bucketed ANN tiers against exact cosine top-k:

- float hyperplane LSH (``build_ann_index`` + the
  ``ann_probe_buckets`` multiprobe rule), varying n_planes x n_probes;
- integer-plane LSH (``build_int_ann_index`` + Hamming-1 multiprobe,
  the oracle-checkable tier), varying n_planes;
- IVF k-means (``build_ivf_index`` + ``ivf_probe``), varying n_probe.

Method: the BUCKET/CLUSTER assignments are produced by the real Spark
operators (one job per index configuration); the per-query candidate
sets then follow the operators' own probe-rule helpers driver-side, so
the measured recall is exactly what ``ann_query``/``int_ann_query``/
``ivf_query`` would return.  recall@k needs no re-ranking step: probe
candidates are scored with EXACT cosine, so the approximate top-k
equals (exact top-k) ∩ (candidate set) — any exact-top-k member in the
candidates is beaten by at most k-1 vectors globally, hence by at most
k-1 candidates.

Cost is reported as the mean candidate fraction (rows scanned / corpus
rows) — the metric that scales: at 10^12 rows, wall time is
proportional to it, while sf0.1 wall time is Spark overhead.

Usage:  python scripts/ann_recall.py [--queries 32] [--k 10]
Prints one JSON line per configuration plus a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def exact_topk(mat: np.ndarray, ids: np.ndarray, qi: int, k: int) -> set[int]:
    """Exact cosine top-k ids for query row qi (query excluded)."""
    n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = n @ n[qi]
    sims[qi] = -np.inf
    top = np.argpartition(-sims, k)[:k]
    top = top[np.argsort(-sims[top])]
    return {int(ids[t]) for t in top}


def evaluate(
    assign: dict[int, int],
    probes_for: "callable",
    ids: np.ndarray,
    mat: np.ndarray,
    q_rows: list[int],
    k: int,
) -> tuple[float, float]:
    """(mean recall@k, mean candidate fraction) over the query rows."""
    recalls, fracs = [], []
    for qi in q_rows:
        truth = exact_topk(mat, ids, qi, k)
        probe = set(probes_for(list(map(float, mat[qi]))))
        cand = {int(i) for i in ids if assign[int(i)] in probe}
        cand.discard(int(ids[qi]))
        recalls.append(len(truth & cand) / k)
        fracs.append(len(cand) / (len(ids) - 1))
    return float(np.mean(recalls)), float(np.mean(fracs))


def pair_recall(spark) -> None:
    """Near-dup PAIR recall of the integer-plane LSH tier
    (``embedding_cosine_pairs_int``, the oracle-checkable path used by
    the embedding_dup_lsh query) vs exact all-pairs cosine, per cosine
    bucket.  Precision is 1.0 by construction (exact cosine verify);
    recall loss is pairs whose sign patterns differ on every plane."""
    from pyspark.sql import functions as F

    from dqmtools_spark.operators import similarity as S

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = nm @ nm.T
    thr = 0.35
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= thr
    truth = {
        (int(ids[a]), int(ids[b])): float(sims[a, b])
        for a, b in zip(iu[0][mask], iu[1][mask])
    }

    tiers = {
        "single_band_12planes": S.embedding_cosine_pairs_int(
            emb, "embedding", "vec_id", S.int_planes(DIM, 12), threshold=thr
        ),
        "banded_14x4": S.embedding_cosine_pairs_int_banded(
            emb, "embedding", "vec_id", DIM, threshold=thr,
            planes_per_band=4, n_bands=14,
        ),
    }
    buckets = [(0.35, 0.5), (0.5, 0.7), (0.7, 0.9), (0.9, 1.01)]
    for name, q in tiers.items():
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in q.collect()
        }
        out = {
            "metric": "embedding_lsh_pair_recall",
            "tier": name,
            "threshold": thr,
            "true_pairs": len(truth),
            "found": len(got & set(truth)),
            "false_positives": len(got - set(truth)),
            "overall_recall": round(
                len(got & set(truth)) / max(len(truth), 1), 4
            ),
            "buckets": [
                {
                    "cosine": f"{lo}-{min(hi, 1.0)}",
                    "pairs": sum(1 for c in truth.values() if lo <= c < hi),
                    "found": sum(
                        1 for p, c in truth.items() if lo <= c < hi and p in got
                    ),
                }
                for lo, hi in buckets
            ],
        }
        print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pairs", action="store_true",
                    help="measure near-dup PAIR recall of the "
                         "integer-plane LSH tier instead of top-k")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dqmtools_spark.operators import similarity as S
    from dqmtools_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(app_name="ann_recall", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    if args.pairs:
        pair_recall(spark)
        spark.stop()
        return
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    n = len(ids)
    q_rows = list(range(0, n, max(n // args.queries, 1)))[: args.queries]
    results = []

    def record(tier, params, rec, frac):
        # lift = recall / candidate fraction: how much better than
        # scanning a random same-sized subset (lift 1.0 = no better)
        line = {
            "tier": tier, **params,
            "recall_at_k": round(rec, 4),
            "cand_fraction": round(frac, 4),
            "lift_vs_random": round(rec / max(frac, 1e-9), 2),
            "k": args.k, "rows": n, "queries": len(q_rows),
        }
        results.append(line)
        print(json.dumps(line), flush=True)

    # ---- float hyperplane LSH -----------------------------------------
    for n_planes in (6, 8, 10):
        idx = S.build_ann_index(emb, "embedding", dim=DIM, n_planes=n_planes)
        assign = {
            int(r["vec_id"]): int(r["bucket"])
            for r in idx.select("vec_id", "bucket").collect()
        }
        for n_probes in (1, 2, 4, 8):
            rec, frac = evaluate(
                assign,
                lambda q, p=n_planes, pr=n_probes: S.ann_probe_buckets(
                    q, n_planes=p, n_probes=pr
                ),
                ids, mat, q_rows, args.k,
            )
            record("float_lsh", {"n_planes": n_planes, "n_probes": n_probes},
                   rec, frac)

    # ---- integer-plane LSH (oracle tier, Hamming-1 multiprobe) --------
    for n_planes in (6, 8, 10):
        planes = S.int_planes(DIM, n_planes)
        idx = S.build_int_ann_index(emb, "embedding", planes)
        assign = {
            int(r["vec_id"]): int(r["bucket"])
            for r in idx.select("vec_id", "bucket").collect()
        }
        rec, frac = evaluate(
            assign,
            lambda q, pl=planes: S.int_ann_probe_buckets(q, pl),
            ids, mat, q_rows, args.k,
        )
        record("int_lsh_h1", {"n_planes": n_planes, "n_probes": n_planes + 1},
               rec, frac)

    # ---- IVF k-means ---------------------------------------------------
    for n_centroids in (16, 64):
        indexed, centroids = S.build_ivf_index(
            emb, "embedding", "vec_id", n_centroids=n_centroids
        )
        assign = {
            int(r["vec_id"]): int(r["cluster"])
            for r in indexed.select("vec_id", "cluster").collect()
        }
        for n_probe in (1, 2, 4, 8):
            rec, frac = evaluate(
                assign,
                lambda q, c=centroids, np_=n_probe: S.ivf_probe(c, q, np_),
                ids, mat, q_rows, args.k,
            )
            record("ivf", {"n_centroids": n_centroids, "n_probe": n_probe},
                   rec, frac)

    # ---- markdown table -------------------------------------------------
    print("\n| tier | params | recall@%d | cand. fraction | lift |" % args.k)
    print("|---|---|---|---|---|")
    for r in results:
        params = ", ".join(
            f"{k}={v}" for k, v in r.items()
            if k in ("n_planes", "n_probes", "n_centroids", "n_probe")
        )
        print(f"| {r['tier']} | {params} | {r['recall_at_k']:.3f} "
              f"| {r['cand_fraction']:.3f} | {r['lift_vs_random']:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
