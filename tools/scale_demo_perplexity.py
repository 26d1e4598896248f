"""Scale demonstration for the self-trained bigram-LM perplexity filter
(``functions.textstats.bigram_nll``).

Synthesizes a corpus far above the query SFs with a LARGE vocabulary —
the regime the operator's join-based plan exists for: ``n_docs``
documents of ``doc_len`` Zipf-distributed tokens over a ``vocab`` -word
vocabulary, so the bigram count table has millions of distinct keys and
the count ride-back is a genuine large-large partitioned join (a
broadcast-dict plan would ship the whole model to every task). Runs the
distributed pipeline end-to-end, then REPLAYS the same model
single-process with vectorized pandas groupbys and compares every
(n_bigrams, nll_bits) row at the emitted 4-dp grid.

Usage: python tools/scale_demo_perplexity.py [n_docs] [doc_len] [vocab]
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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    doc_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_tokens = n_docs * doc_len

    t0 = time.perf_counter()
    rng = np.random.RandomState(47)
    # Zipf-ish over the vocab: heavy head (stopword-like), long tail
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    ids = rng.choice(vocab, size=n_tokens, p=probs).reshape(n_docs, doc_len)
    words = np.char.add("w", np.arange(vocab).astype(str))
    texts = [" ".join(row) for row in words[ids]]
    doc_ids = np.arange(n_docs, dtype=np.int64)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.textstats import bigram_nll

    docs = rd.from_arrow(
        pa.table({"doc_id": doc_ids, "text": pa.array(texts, pa.string())})
    ).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    out = (
        bigram_nll(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    run_sec = time.perf_counter() - t0
    ray.shutdown()

    # vectorized single-process replay of the identical model
    t0 = time.perf_counter()
    w1 = ids[:, :-1].reshape(-1)
    w2 = ids[:, 1:].reshape(-1)
    big = w1.astype(np.int64) * vocab + w2
    df = pd.DataFrame({"doc": np.repeat(doc_ids, doc_len - 1),
                       "w1": w1, "big": big})
    nb = df.groupby("big")["doc"].size()
    nc = df.groupby("w1")["doc"].size()
    v = len(np.unique(ids))
    nll = (np.log2(nc.loc[df["w1"]].to_numpy() + float(v))
           - np.log2(nb.loc[df["big"]].to_numpy() + 1.0))
    per = pd.DataFrame({"doc": df["doc"], "nll": nll}).groupby("doc")["nll"]
    want_nll = np.round(per.sum().to_numpy() / per.size().to_numpy(), 4)
    want_n = per.size().to_numpy()
    replay_sec = time.perf_counter() - t0

    match = (
        out["doc_id"].to_numpy().tolist() == doc_ids.tolist()
        and (out["n_bigrams"].to_numpy() == want_n).all()
        and bool(np.allclose(out["nll_bits"].to_numpy(), want_nll,
                             atol=1e-9))
    )
    rec = {
        "demo": "bigram_nll_zipf_corpus",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "vocab_drawn": int(v),
        "distinct_bigrams": int(nb.size),
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "pipeline_sec": round(run_sec, 2),
        "replay_sec": round(replay_sec, 2),
        "tokens_per_sec": round(n_tokens / run_sec, 1),
        "match": bool(match),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
