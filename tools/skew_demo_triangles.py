"""Hub-skew demonstration for the degree-oriented triangle kernel
(VERDICT r4 item 3).

Synthesizes an undirected graph with one hub node at ~100x the median
degree (the judge-requested shape), then:

  1. computes, analytically from the degree table, the MAX per-src wedge
     fan-out under (a) the r4 id-orientation and (b) the shipped
     degree-orientation — the number every wedge-join task's input is
     bounded by;
  2. runs ``triangle_count_edges`` end-to-end on the synthetic graph and
     verifies the count bit-for-bit against a driver-side numpy replay
     (brute adjacency-set intersection over the oriented edges).

Usage: python tools/skew_demo_triangles.py [n_nodes] [base_deg]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_nodes: int, base_deg: int):
    """Distinct undirected edges (lo < hi): an Erdos-Renyi-ish background
    at ~base_deg average degree plus ONE hub (node 0 — the worst case for
    id-orientation, which fans every hub wedge out of the minimum id)
    connected to ~100x base_deg distinct nodes."""
    rng = np.random.RandomState(41)
    n_bg = n_nodes * base_deg // 2
    u = rng.randint(0, n_nodes, size=n_bg).astype(np.int64)
    v = rng.randint(0, n_nodes, size=n_bg).astype(np.int64)
    m = u != v
    lo = np.minimum(u[m], v[m])
    hi = np.maximum(u[m], v[m])
    hub_deg = min(100 * base_deg, n_nodes - 1)
    hub_nbrs = rng.choice(np.arange(1, n_nodes, dtype=np.int64),
                          size=hub_deg, replace=False)
    lo = np.concatenate([lo, np.zeros(hub_deg, dtype=np.int64)])
    hi = np.concatenate([hi, hub_nbrs])
    pairs = np.unique(lo * np.int64(1 << 32) + hi)
    return (pairs >> np.int64(32)).astype(np.int64), (
        pairs & np.int64((1 << 32) - 1)
    ).astype(np.int64)


def wedge_fanout(lo: np.ndarray, hi: np.ndarray):
    """Max per-src wedge count (out_deg choose 2) under both orientations."""
    deg = np.bincount(np.concatenate([lo, hi]))

    def max_wedges(src: np.ndarray) -> int:
        od = np.bincount(src)
        return int((od.astype(np.int64) * (od - 1) // 2).max())

    # id orientation: src = min id = lo (edges already lo < hi)
    by_id = max_wedges(lo)
    # degree orientation: src = argmin (deg, id)
    swap = deg[hi] < deg[lo]
    by_deg = max_wedges(np.where(swap, hi, lo))
    return by_id, by_deg, int(np.median(deg[deg > 0])), int(deg.max())


def reference_triangles(lo: np.ndarray, hi: np.ndarray) -> int:
    """Driver-side numpy replay: sorted-pair membership over id-oriented
    wedges (orientation-invariant count)."""
    pk = set((lo * np.int64(1 << 32) + hi).tolist())
    import collections

    adj = collections.defaultdict(list)
    for a, b in zip(lo.tolist(), hi.tolist()):
        adj[a].append(b)
    n = 0
    for a, nbrs in adj.items():
        nbrs.sort()
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if nbrs[i] * (1 << 32) + nbrs[j] in pk:
                    n += 1
    return n


def main() -> int:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    base_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import pyarrow as pa

    import ray
    import ray.data as rd

    lo, hi = build(n_nodes, base_deg)
    by_id, by_deg, med_deg, max_deg = wedge_fanout(lo, hi)
    expect = reference_triangles(lo, hi)

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.pipelines.graph import triangle_count_edges

    edges = rd.from_arrow(pa.table({"lo": lo, "hi": hi})).repartition(64)
    t0 = time.perf_counter()
    got = int(triangle_count_edges(edges.materialize())["n_triangles"][0])
    wall = time.perf_counter() - t0
    ray.shutdown()

    out = {
        "demo": "triangles_hub_skew",
        "n_nodes": n_nodes,
        "n_edges": int(len(lo)),
        "median_degree": med_deg,
        "hub_degree": max_deg,
        "max_src_wedges_id_orient": by_id,
        "max_src_wedges_degree_orient": by_deg,
        "fanout_reduction": round(by_id / max(1, by_deg), 1),
        "n_triangles": got,
        "match": got == expect,
        "sec": round(wall, 3),
    }
    print(json.dumps(out))
    return 0 if got == expect else 1


if __name__ == "__main__":
    raise SystemExit(main())
