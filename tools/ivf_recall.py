"""IVF ANN quality telemetry: recall@k vs nprobe, seeded vs Lloyd-refined
centroids, plus the cell-size histogram — the numbers BENCH.md quotes next
to the LID accuracy figure.

Fixture: a deterministic clustered corpus (16 direction clusters in 64-dim,
seeded numpy RNG — the regime IVF exists for; uniform random vectors have
no cluster structure and every ANN method degrades to nprobe/nlist there).
Ground truth is brute_topk. Prints ONE JSON line:

    {"recall_at_10": {"seeded": {"1": r, ...}, "refined": {...}},
     "cell_balance": {"seeded": {...}, "refined": {...}}, ...}

Usage: python tools/ivf_recall.py [n_docs] [nlist]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
NLIST = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DIM = 64
K = 10
N_QUERIES = 40
NPROBES = (1, 2, 4, 8)
REFINE_ITERS = 2


def make_corpus(n: int, dim: int, n_clusters: int = 16):
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + 0.15 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    return rows


def main() -> int:
    from bm25_spark.operators import similarity
    from bm25_spark.session import get_spark

    spark = get_spark(
        app="ivf-recall", cores=8, shuffle_partitions=8, driver_memory="8g"
    )
    rows = make_corpus(N_DOCS, DIM)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb = emb.persist()
    emb.count()
    step = max(1, N_DOCS // N_QUERIES)
    qs = [(i, rows[i][1]) for i in range(0, N_DOCS, step)][:N_QUERIES]

    brute = similarity.brute_topk(emb, qs, k=K).collect()
    truth: dict[int, set[int]] = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["id"])

    seeds = similarity.ivf_seed_centroids(emb, nlist=NLIST)
    refined = similarity.ivf_refine_centroids(emb, seeds, iters=REFINE_ITERS)

    out: dict = {
        "n_docs": N_DOCS, "dim": DIM, "nlist": NLIST, "k": K,
        "n_queries": len(qs), "refine_iters": REFINE_ITERS,
        "recall_at_10": {}, "cell_balance": {},
    }
    for name, cents in (("seeded", seeds), ("refined", refined)):
        stats: dict = {}
        similarity.ivf_cells(emb, centroids=cents, stats=stats)
        out["cell_balance"][name] = {
            "nonempty_cells": stats["nonempty_cells"],
            "min_cell": stats["min_cell"],
            "mean_cell": stats["mean_cell"],
            "max_cell": stats["max_cell"],
        }
        by_probe = {}
        for nprobe in NPROBES:
            got = similarity.ivf_topk(
                emb, qs, k=K, nprobe=nprobe, centroids=cents
            ).collect()
            hit = sum(
                1 for r in got if r["id"] in truth.get(r["query_id"], set())
            )
            total = sum(len(v) for v in truth.values())
            by_probe[str(nprobe)] = round(hit / total, 4)
        out["recall_at_10"][name] = by_probe

    # refined must dominate (or tie) seeded at every nprobe on clustered
    # data; a regression here means the Lloyd pass is broken
    for p in NPROBES:
        s = out["recall_at_10"]["seeded"][str(p)]
        r = out["recall_at_10"]["refined"][str(p)]
        assert r >= s - 0.02, (p, s, r)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
