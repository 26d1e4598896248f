"""Wide-path scale demonstration for the near-dedup family.

The sandbox SF corpora never cross the adaptive gates (their candidate
volumes are tiny), so the bench exercises only the bounded fast paths.
This demo synthesizes a HIGH-DUPLICATION corpus — the shape of a real web
crawl — sized so the pipeline crosses every gate and runs the 100-TB
shapes end-to-end:

- candidate pair rows  >> _BROADCAST_PAIR_LIMIT  -> Dataset verify path
  (distributed pair dedup + capped-Bloom semi-filter + cogroup shingle
  joins)
- verified pairs       >> _BROADCAST_PAIR_LIMIT  -> distributed
  connected components (pointer-doubling min-label propagation)
- drop set as a Dataset -> adaptive semi/anti join

Corpus: n_groups clusters of dup_factor near-identical docs (two words
swapped per variant) + singleton distractors. Ground truth is exact:
every in-group pair collides in >=1 LSH band at high Jaccard, so the
component count and drop count are checkable.

Usage: python tools/scale_demo.py [n_groups] [dup_factor] [n_singles]
Prints one JSON line with timings and checks; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu",
]


def build_corpus(n_groups: int, dup_factor: int, n_singles: int):
    import pyarrow as pa

    rng = np.random.RandomState(7)
    doc_ids, texts = [], []
    did = 0
    for g in range(n_groups):
        base = [WORDS[i] for i in rng.randint(0, len(WORDS), size=40)]
        for v in range(dup_factor):
            toks = list(base)
            # two word swaps per variant keeps Jaccard ~0.85-0.95
            for _ in range(2):
                toks[int(rng.randint(0, len(toks)))] = WORDS[int(rng.randint(0, len(WORDS)))]
            doc_ids.append(did)
            texts.append(" ".join(toks) + f" g{g}marker")
            did += 1
    for s in range(n_singles):
        toks = [WORDS[i] for i in rng.randint(0, len(WORDS), size=40)]
        doc_ids.append(did)
        texts.append(" ".join(toks) + f" s{s}unique{rng.randint(1 << 30)}")
        did += 1
    return pa.Table.from_pydict(
        {"doc_id": pa.array(doc_ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    dup_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_singles = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ocr_ray.functions import dedup
    from ocr_ray.pipelines.joins import semi_anti_join

    table = build_corpus(n_groups, dup_factor, n_singles)
    n_docs = table.num_rows
    docs = rd.from_arrow(table).repartition(64).materialize()

    out: dict = {
        "metric": "neardedup_wide_path_demo",
        "n_docs": n_docs,
        "n_groups": n_groups,
        "dup_factor": dup_factor,
        "gates": {
            "pair_gate": dedup._BROADCAST_PAIR_LIMIT,
            "bloom_cap": dedup._BLOOM_CAPACITY_CAP,
        },
    }

    t0 = time.perf_counter()
    pairs = dedup.minhash_pairs(docs, threshold=0.5).materialize()
    n_pairs = pairs.count()
    out["pairs_sec"] = round(time.perf_counter() - t0, 2)
    out["n_verified_pairs"] = n_pairs
    out["wide_path_engaged"] = n_pairs > dedup._BROADCAST_PAIR_LIMIT

    t0 = time.perf_counter()
    clusters = dedup.cluster_pairs_dataset(pairs).materialize()
    out["components_sec"] = round(time.perf_counter() - t0, 2)
    n_clustered = clusters.count()
    n_components = (
        clusters.groupby("cluster_id").count().count()
    )

    # drop set derived from the SAME clusters Dataset (the curation DAG
    # shape), removed with the adaptive anti-join
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_drops(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["doc_id"], t["cluster_id"])
        return t.filter(pc.invert(keep)).select(["doc_id"])

    t0 = time.perf_counter()
    drops = clusters.map_batches(to_drops, batch_format="pyarrow").materialize()
    n_drops = drops.count()
    survivors = semi_anti_join(
        docs.select_columns(["doc_id"]), drops, on="doc_id", anti=True
    ).materialize()
    out["droplist_antijoin_sec"] = round(time.perf_counter() - t0, 2)
    out["n_clustered_docs"] = n_clustered
    out["n_components"] = n_components
    out["n_drops"] = n_drops
    out["n_survivors"] = survivors.count()

    # exact internal-consistency checks (LSH recall on borderline pairs is
    # <100% by design, so component counts — not the planted group count —
    # are the ground truth): one keeper per component, survivors = rest
    out["check_drops_exact"] = bool(n_drops == n_clustered - n_components)
    out["check_survivors_exact"] = bool(
        out["n_survivors"] == n_docs - n_drops
    )
    # planted-group recall (informational): fraction of planted dup docs
    # that entered any cluster
    out["planted_recall"] = round(n_clustered / (n_groups * dup_factor), 4)
    # distributed components path (not the driver union-find) must engage
    out["components_distributed"] = n_pairs > dedup._BROADCAST_PAIR_LIMIT

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
