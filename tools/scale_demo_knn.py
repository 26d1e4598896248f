"""Scale demonstration for the similarity-search family: brute-force
cosine top-k (the exact baseline) vs IVF (the scale path) on a
clustered synthetic embedding corpus far above the query SFs.

N vectors in d=64 drawn around 64 cluster centers (unit-noise), 16
query vectors; measures wall time of both paths and IVF recall@10
against the brute answer. The point at 100 TB scale: brute scans every
vector per query (one broadcast matmul per block — embarrassingly
parallel but O(N) work per query), while IVF scans only the n_probe
nearest buckets' vectors — the demo reports the scanned-fraction
economics alongside the recall cost.

Usage: python tools/scale_demo_knn.py [n_vecs] [ncpu]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def build(n: int, d: int = 64, n_clusters: int = 64):
    rng = np.random.RandomState(97)
    centers = rng.randn(n_clusters, d) * 3.0
    which = rng.randint(0, n_clusters, size=n)
    mat = centers[which] + rng.randn(n, d)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(
            [row for row in mat.astype(np.float32)],
            pa.list_(pa.float32()),
        ),
    })


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.perf_counter()
    tbl = build(n)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.similarity import default_queries, knn_brute, knn_ivf

    embs = rd.from_arrow(tbl).repartition(ncpu * 2).materialize()
    qids, qmat = default_queries(embs, 256)

    t0 = time.perf_counter()
    brute = knn_brute(embs, qids, qmat, k=10)
    brute_sec = time.perf_counter() - t0

    n_probe, n_centroids = 8, 64
    t0 = time.perf_counter()
    ivf = knn_ivf(embs, qids, qmat, k=10,
                  n_centroids=n_centroids, n_probe=n_probe)
    ivf_sec = time.perf_counter() - t0

    bset = set(zip(brute["query_id"], brute["neighbor_id"]))
    iset = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(bset & iset) / len(bset)

    rec = {
        "demo": "knn_brute_vs_ivf",
        "n_vecs": n,
        "dim": 64,
        "n_queries": int(len(qids)),
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "brute_sec": round(brute_sec, 2),
        "ivf_sec": round(ivf_sec, 2),
        "ivf_probe_fraction": round(n_probe / n_centroids, 3),
        "recall_at_10": round(recall, 4),
        "match": recall >= 0.9,
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
