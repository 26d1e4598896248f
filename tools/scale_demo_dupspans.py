"""Scale demonstration for the exact substring duplicate-span kernel
(``functions.dedup.dup_spans``).

Synthesizes a corpus far above the query SFs with the two shapes that
stress the kernel at 100-TB scale:

  1. a planted 30-token BOILERPLATE paragraph injected into ~10% of all
     docs — every window inside it becomes ONE mega-hot key shared by
     tens of thousands of documents (the skew case for the count
     shuffle: per-block np.unique partials must collapse it before the
     exchange, and the hit set is a large fraction of the corpus);
  2. a handful of exact full-document duplicates (the dense-coverage
     case: dup_tokens == n_tokens).

Runs dup_spans end-to-end on Ray (num_cpus from $RAY_GRAFT_CPUS,
default 32), then verifies the per-doc output AGGREGATES (doc count,
sum of dup_windows, sum of dup_tokens, full-coverage doc count) against
a single-process numpy replay over the same corpus. The replay shares
the window/coverage kernels (`_window_rows` + the interval-union sweep)
with the distributed plan — the demo's claim is that the DISTRIBUTED
composition (partial counts -> bucket sum -> adaptive semi-join ->
doc-hash coverage shuffle) loses nothing, at a size where a driver-side
implementation is already painful.

Usage: python tools/scale_demo_dupspans.py [n_docs] [tokens_per_doc]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa


def build(n_docs: int, toks_per_doc: int) -> pd.DataFrame:
    rng = np.random.RandomState(97)
    vocab = np.array([f"t{i}" for i in range(50_000)], dtype=object)
    boiler = " ".join(f"b{i}" for i in range(30))
    texts = []
    mat = rng.randint(0, vocab.size, size=(n_docs, toks_per_doc))
    for i in range(n_docs):
        s = " ".join(vocab[mat[i]])
        if i % 10 == 3:  # ~10%: planted boilerplate (mega-hot windows)
            cut = s.find(" ", len(s) // 2)
            s = s[:cut] + " " + boiler + s[cut:]
        texts.append(s)
    # exact full duplicates: the last 5 docs repeat the first 5
    for j in range(5):
        texts[n_docs - 5 + j] = texts[j]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def replay(df: pd.DataFrame, window: int) -> dict:
    """Single-process ground truth over the same md5 window keys."""
    from ocr_ray.functions.dedup import _window_rows

    parts = []
    step = 20_000
    for lo in range(0, len(df), step):
        t = pa.Table.from_pandas(df.iloc[lo:lo + step], preserve_index=False)
        parts.append(_window_rows(t, window))
    allw = pa.concat_tables(parts)
    key = allw.column("wkey").to_numpy()
    doc = allw.column("doc_id").to_numpy()
    pos = allw.column("pos").to_numpy()
    ntk = allw.column("n_tokens").to_numpy()
    k, c = np.unique(key, return_counts=True)
    mask = np.isin(key, k[c >= 2])
    doc, pos, ntk = doc[mask], pos[mask], ntk[mask]
    order = np.lexsort((pos, doc))
    d, p, nt = doc[order], pos[order], ntk[order]
    e = p + window - 1
    new = np.r_[True, d[1:] != d[:-1]]
    seg = np.cumsum(new) - 1
    off = int(e.max()) + window
    cm = np.maximum.accumulate(e + seg * off) - seg * off
    pm = np.r_[0, cm[:-1]]
    contrib = np.where(new | (pm < p), window, e - pm)
    st = np.flatnonzero(new)
    dup_tokens = np.add.reduceat(contrib, st)
    dup_windows = np.diff(np.r_[st, contrib.size])
    full = int((dup_tokens == nt[st]).sum())
    return {"docs": int(st.size), "sum_windows": int(dup_windows.sum()),
            "sum_tokens": int(dup_tokens.sum()), "full_coverage_docs": full,
            "total_windows": int(key.size)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    toks = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.perf_counter()
    df = build(n_docs, toks)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.dedup import dup_spans

    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    out = dup_spans(ds).to_pandas()
    run_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    truth = replay(df, 8)
    replay_sec = time.perf_counter() - t0

    got = {
        "docs": int(len(out)),
        "sum_windows": int(out["dup_windows"].sum()),
        "sum_tokens": int(out["dup_tokens"].sum()),
        "full_coverage_docs": int(
            (out["dup_tokens"] == out["n_tokens"]).sum()
        ),
    }
    rec = {
        "demo": "dup_spans_boilerplate_skew",
        "n_docs": n_docs,
        "tokens_per_doc": toks,
        "total_windows": truth["total_windows"],
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "dup_spans_sec": round(run_sec, 2),
        "windows_per_sec": round(truth["total_windows"] / run_sec, 1),
        "replay_sec": round(replay_sec, 2),
        "result": got,
        "match": all(got[k] == truth[k] for k in got),
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
