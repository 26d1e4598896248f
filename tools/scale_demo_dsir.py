"""Scale demonstration for DSIR importance weighting
(``functions.textstats.dsir_logratio``).

Synthesizes a corpus far above the query SFs in the regime the operator
is built for: ``n_docs`` documents of ``doc_len`` Zipf tokens over a
``vocab``-word vocabulary, with a target subset (lang='en', ~20% of
docs) drawn from a SHIFTED Zipf so the target/raw distributions
genuinely differ and the learned log-ratios separate the classes. Runs
the distributed pipeline end-to-end (pass 1: per-block partials ->
256-key grouped sum; pass 2: closure-broadcast scoring), then REPLAYS
the identical model single-process (vocab-level md5 bucketing, numpy
bincounts) and compares every (n_tokens, dsir_logratio) row at the
emitted 4-dp grid. Also reports the class separation (mean target vs
non-target score) as a sanity check that the operator does what the
paper says.

Usage: python tools/scale_demo_dsir.py [n_docs] [doc_len] [vocab]
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
    B = 256

    t0 = time.perf_counter()
    rng = np.random.RandomState(53)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p_raw = (1.0 / ranks) / (1.0 / ranks).sum()
    # target distribution: the same Zipf over a PERMUTED vocab — same
    # marginal shape, different per-word mass (a clean domain shift)
    perm = rng.permutation(vocab)
    p_tgt = p_raw[np.argsort(perm)]
    is_en = rng.rand(n_docs) < 0.2
    ids = np.empty((n_docs, doc_len), dtype=np.int64)
    n_en = int(is_en.sum())
    ids[is_en] = rng.choice(vocab, size=(n_en, doc_len), p=p_tgt)
    ids[~is_en] = rng.choice(vocab, size=(n_docs - n_en, doc_len), p=p_raw)
    words = np.char.add("w", np.arange(vocab).astype(str))
    texts = [" ".join(row) for row in words[ids]]
    doc_ids = np.arange(n_docs, dtype=np.int64)
    langs = np.where(is_en, "en", "xx")
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.textstats import dsir_logratio

    docs = rd.from_arrow(
        pa.table({"doc_id": doc_ids,
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(langs.tolist(), pa.string())})
    ).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    out = (
        dsir_logratio(docs, target_lang="en")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    run_sec = time.perf_counter() - t0
    ray.shutdown()

    # single-process replay: md5-bucket the VOCAB once (the same
    # vocab-level hashing trick the kernel uses per block), then numpy
    t0 = time.perf_counter()
    from ocr_ray.functions.sampling import key_hash64

    wbuck = (key_hash64(words.tolist()) % np.uint64(B)).astype(np.int64)
    tok_b = wbuck[ids]  # (n_docs, doc_len) buckets
    raw_cnt = np.bincount(tok_b.reshape(-1), minlength=B).astype(np.float64)
    tgt_cnt = np.bincount(tok_b[is_en].reshape(-1), minlength=B).astype(
        np.float64)
    term = np.log2((tgt_cnt + 1.0) / (tgt_cnt.sum() + float(B))) - np.log2(
        (raw_cnt + 1.0) / (raw_cnt.sum() + float(B)))
    # per-doc sum over (doc,bucket) groups of c*term, matching the kernel
    flat_keys = np.repeat(doc_ids, doc_len) * B + tok_b.reshape(-1)
    uk, cnt = np.unique(flat_keys, return_counts=True)
    want = np.round(
        np.bincount((uk // B), weights=cnt * term[uk % B],
                    minlength=n_docs), 4)
    replay_sec = time.perf_counter() - t0

    match = (
        out["doc_id"].to_numpy().tolist() == doc_ids.tolist()
        and (out["n_tokens"].to_numpy() == doc_len).all()
        and bool(np.allclose(out["dsir_logratio"].to_numpy(), want,
                             atol=1e-9))
    )
    sc = out["dsir_logratio"].to_numpy()
    rec = {
        "demo": "dsir_zipf_domain_shift",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "target_docs": int(n_en),
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "pipeline_sec": round(run_sec, 2),
        "replay_sec": round(replay_sec, 2),
        "tokens_per_sec": round(n_tokens / run_sec, 1),
        "mean_score_target": round(float(sc[is_en].mean()), 3),
        "mean_score_other": round(float(sc[~is_en].mean()), 3),
        "match": bool(match),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
