"""Scale demonstration for the retrieval family: BM25 top-k and the
inverted-index build at corpus volume.

400k synthetic docs (Zipf vocabulary, 40-120 tokens) with three query
terms planted at controlled frequencies. Measures: BM25 two-pass wall
time (stats reduction + scoring pass with per-block partial top-k),
inverted-index build wall time (explode -> bucketed grouped agg with
min_df pruning), and checks BM25's top-k against a single-process
numpy replay of the identical formula.

Usage: python tools/scale_demo_retrieval.py [n_docs] [ncpu]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa


def build(n_docs: int):
    rng = np.random.RandomState(107)
    vocab = np.array([f"w{i:05d}" for i in range(30_000)], dtype=object)
    # Zipf-ish: sample ranks from a power law
    lens = rng.randint(40, 121, size=n_docs)
    tot = int(lens.sum())
    ranks = (np.power(rng.rand(tot), 3.0) * 30_000).astype(np.int64)
    ranks = np.minimum(ranks, 29_999)
    toks = vocab[ranks]
    # plant query terms: "scan" in ~5%, "merge" in ~1%, "rare" in ~0.1%
    plant = rng.rand(tot)
    toks = np.where(plant < 0.0005, "rareterm",
                    np.where(plant < 0.005, "mergeterm",
                             np.where(plant < 0.03, "scanterm", toks)))
    offs = np.r_[0, np.cumsum(lens)]
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def bm25_replay(tbl, terms, k):
    texts = tbl.column("text").to_pylist()
    n = len(texts)
    dl = np.zeros(n, dtype=np.int64)
    tfs = [np.zeros(n, dtype=np.int64) for _ in terms]
    for i, txt in enumerate(texts):
        ws = txt.split()
        dl[i] = len(ws)
        for j, term in enumerate(terms):
            tfs[j][i] = sum(1 for w in ws if w == term)
    avgdl = dl.sum() / n
    score = np.zeros(n, dtype=np.float64)
    norm = 0.25 + 0.75 * (dl.astype(np.float64) / avgdl)
    for j, term in enumerate(terms):
        df = int((tfs[j] > 0).sum())
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tff = tfs[j].astype(np.float64)
        score = score + idf * ((tff * 2.2) / (tff + 1.2 * norm))
    s6 = np.sign(score) * np.floor(np.abs(score) * 1e6 + 0.5) / 1e6
    order = np.lexsort((np.arange(n), -s6))[:k]
    return [(int(i), float(s6[i])) for i in order]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.perf_counter()
    tbl = build(n_docs)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.retrieval import bm25_topk, inverted_index

    docs = rd.from_arrow(tbl).repartition(ncpu * 2).materialize()
    terms = ["scanterm", "mergeterm", "rareterm"]

    t0 = time.perf_counter()
    top = bm25_topk(docs, terms, k=20)
    bm25_sec = time.perf_counter() - t0

    exp = bm25_replay(tbl, terms, 20)
    got = list(zip(top["doc_id"].tolist(),
                   top["score"].tolist()))
    match = got == exp

    t0 = time.perf_counter()
    idx = inverted_index(docs, min_df=5)
    n_postings = idx.count()
    index_sec = time.perf_counter() - t0

    rec = {
        "demo": "retrieval_bm25_index",
        "n_docs": n_docs,
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "bm25_sec": round(bm25_sec, 2),
        "bm25_docs_per_sec": round(n_docs / bm25_sec, 1),
        "index_sec": round(index_sec, 2),
        "n_postings": int(n_postings),
        "match": bool(match),
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
