"""Scale demonstration for SemDeDup semantic dedup
(``functions.similarity.semdedup``).

Synthesizes an embedding corpus far above the query SFs with planted
semantic-duplicate structure: ``n_anchors`` random 64-d anchors, each
replicated ``copies`` times with small gaussian jitter (within-group
cosines ~0.99, cross-group ~0). Runs the full distributed pipeline
(seeded k-means train -> broadcast argmax assign -> per-cluster chunked
pairwise) at ``n_clusters`` sized for the corpus (the SemDeDup knob: k
grows with N so per-cluster work stays bounded), then REPLAYS the exact
same math single-process in numpy and compares every (cluster, is_dup)
bit. Reports wall time, vectors/sec, dup fraction, and the largest
cluster (the per-task bound).

Usage: python tools/scale_demo_semdedup.py [n_anchors] [copies] [n_clusters]
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

DIM = 64
TAU = 0.9
TRAIN_SAMPLE = 8192


def main() -> None:
    n_anchors = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_clusters = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n = n_anchors * copies

    t0 = time.perf_counter()
    rng = np.random.RandomState(31)
    anchors = rng.randn(n_anchors, DIM)
    # interleave copies so near-dup groups are NOT block-local — the
    # cluster shuffle has to bring them together
    mat = (np.repeat(anchors, copies, axis=0)
           + 0.05 * rng.randn(n, DIM)).astype(np.float32)
    perm = rng.permutation(n)
    mat = mat[perm]
    vec_ids = np.arange(n, dtype=np.int64)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ocr_ray.functions.similarity as S

    tbl = pa.table(
        {"vec_id": vec_ids,
         "embedding": pa.FixedSizeListArray.from_arrays(
             pa.array(mat.reshape(-1), pa.float32()), DIM).cast(
                 pa.list_(pa.float32()))}
    )
    embs = rd.from_arrow(tbl).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    out = (
        S.semdedup(embs, n_clusters=n_clusters, tau=TAU,
                   train_sample=TRAIN_SAMPLE)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    run_sec = time.perf_counter() - t0
    ray.shutdown()

    # single-process replay of the identical math (vec_ids are already
    # 0..n-1 in `mat` row order)
    t0 = time.perf_counter()
    u = S._unit(mat.astype(np.float64))
    cent = S.train_centroids(u[:TRAIN_SAMPLE], n_clusters, 10)
    asg = np.empty(n, dtype=np.int64)
    for i0 in range(0, n, 65536):
        i1 = min(i0 + 65536, n)
        asg[i0:i1] = np.argmax(u[i0:i1] @ cent.T, axis=1)
    dup = np.zeros(n, dtype=bool)
    max_cluster = 0
    for c in range(n_clusters):
        idx = np.where(asg == c)[0]  # ascending == vec_id order
        max_cluster = max(max_cluster, len(idx))
        v = u[idx]
        ch = 1024
        for a0 in range(1, len(idx), ch):
            a1 = min(a0 + ch, len(idx))
            g = np.round(v[:a1] @ v[a0:a1].T, 4)
            low = np.arange(a1)[:, None] < np.arange(a0, a1)[None, :]
            dup[idx[a0:a1]] = ((g >= TAU) & low).any(axis=0)
    replay_sec = time.perf_counter() - t0

    match = (
        out["vec_id"].to_numpy().tolist() == vec_ids.tolist()
        and (out["cluster"].to_numpy() == asg).all()
        and (out["is_dup"].to_numpy() == dup.astype(np.int64)).all()
    )
    rec = {
        "demo": "semdedup_planted_groups",
        "n_vectors": n,
        "dim": DIM,
        "n_clusters": n_clusters,
        "tau": TAU,
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "pipeline_sec": round(run_sec, 2),
        "replay_sec": round(replay_sec, 2),
        "vectors_per_sec": round(n / run_sec, 1),
        "dup_fraction": round(float(dup.mean()), 4),
        "max_cluster_size": int(max_cluster),
        "match": bool(match),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
