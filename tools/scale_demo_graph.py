"""Scale/skew demonstration for the iterative graph kernel.

The derived trade graph is small (1.17M edges at sf0.1) and near-uniform,
so this synthesizes a 10M-directed-edge graph with corpus-scale node
cardinality PLUS one celebrity node participating in 10% of all edges —
the skewed shape the per-block contribution partials must absorb: the
celebrity's 500k in-edges pre-combine to at most one row per block
before the hash(dst) shuffle that would otherwise land them all in a
single bucket.

Runs pagerank_edges (3 exact integer fixed-point iterations) end-to-end
and verifies the full rank vector bit-for-bit against a driver-side
pandas replay of the same recurrence over the identical edge file.

Usage: python tools/scale_demo_graph.py [n_edges] [n_nodes]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_edges: int, n_nodes: int, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(23)
    n_hot = n_edges // 10  # the celebrity participates in 10% of edges
    # undirected pairs (u, v), u != v, node ids 1..n_nodes; node 1 is hot
    u = np.concatenate([
        np.full(n_hot, 1, dtype=np.int64),
        rng.randint(1, n_nodes + 1, size=n_edges - n_hot).astype(np.int64),
    ])
    v = rng.randint(1, n_nodes + 1, size=n_edges).astype(np.int64)
    m = u != v
    u, v = u[m], v[m]
    # both orientations -> every node with any edge has in AND out edges
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    t = pa.table({"src": src, "dst": dst})
    pq.write_table(t, os.path.join(path, "edges.parquet"))


def reference_pagerank(path: str, iters: int):
    """Driver-side pandas replay of the exact integer recurrence."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.graph import PR_SCALE

    e = pq.read_table(os.path.join(path, "edges.parquet")).to_pandas()
    # the engine dedups nothing here (the edge list ships as-is), so the
    # replay must not either
    deg = e.groupby("src").size()
    n = len(deg)
    r0 = PR_SCALE // n
    base = 15 * r0 // 100
    pr = pd.Series(r0, index=deg.index, dtype="int64")
    for _ in range(iters):
        contrib = (pr // deg).reindex(e["src"]).to_numpy()
        s = pd.Series(contrib, index=e["dst"]).groupby(level=0).sum()
        pr = (base + 85 * s // 100).astype("int64")
    return pr.rename_axis("node").rename("pr").reset_index().sort_values(
        "node"
    ).reset_index(drop=True)


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    work = f"/tmp/ocr_ray_graphdemo_{n_edges}_{n_nodes}"
    os.makedirs(work, exist_ok=True)
    if not os.path.exists(os.path.join(work, "edges.parquet")):
        build(n_edges, n_nodes, work)

    import ray.data as rd

    from ocr_ray.pipelines.graph import PR_ITERS, pagerank_edges

    edge_ds = rd.read_parquet(os.path.join(work, "edges.parquet"))
    t0 = time.perf_counter()
    got = pagerank_edges(edge_ds, iters=PR_ITERS)
    pagerank_sec = round(time.perf_counter() - t0, 2)

    exp = reference_pagerank(work, PR_ITERS)
    pd.testing.assert_frame_equal(got, exp)

    out = {
        "n_directed_edges": int(2 * n_edges),
        "n_nodes": int(len(got)),
        "celebrity_edge_share": 0.1,
        "celebrity_degree": int(
            (pd.read_parquet(os.path.join(work, "edges.parquet"))["src"] == 1).sum()
        ),
        "iters": PR_ITERS,
        "pagerank_sec": pagerank_sec,
        "exact_match_vs_pandas_replay": True,
        "num_cpus": 32,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
