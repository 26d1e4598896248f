"""Scale demonstration for distributed BPE merge learning
(``functions.bpe.bpe_merges_from_words``).

Synthesizes a weighted vocabulary far above the query SFs — ``n_words``
DISTINCT random words (length 4-12 over an 8-letter alphabet, so pair
collisions are dense and merges meaningful) with Zipf-distributed
frequencies — and learns ``k`` merges end-to-end on Ray. Then REPLAYS
the identical semantics single-process (dict + Counter) and compares
the full (pair, n) merge list. Reports wall time and words/sec through
the k iterative rounds (each round = one map pass + one bucketed
grouped sum + one merge-apply pass over the distinct-word Dataset).

Usage: python tools/scale_demo_bpe.py [n_words] [k]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

_ALPHA = np.array(list("abcdefgh"), dtype=object)


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.perf_counter()
    rng = np.random.RandomState(59)
    lens = rng.randint(4, 13, size=n_words * 2)
    mat = rng.randint(0, 8, size=(n_words * 2, 12))
    seen, words = set(), []
    for row, ln in zip(mat, lens):
        w = "".join(_ALPHA[row[:ln]])
        if w not in seen:
            seen.add(w)
            words.append(w)
            if len(words) == n_words:
                break
    n_words = len(words)
    ranks = np.arange(1, n_words + 1, dtype=np.float64)
    freqs = np.maximum(1, (1e6 / ranks)).astype(np.int64)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.bpe import bpe_merges_from_words

    wc = rd.from_arrow(
        pa.table({"tok": pa.array(words, pa.string()),
                  "freq": pa.array(freqs, pa.int64())})
    ).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    got = bpe_merges_from_words(wc, k=k)
    run_sec = time.perf_counter() - t0
    ray.shutdown()

    # single-process replay of the identical semantics
    t0 = time.perf_counter()
    tab = {" ".join(w): int(f) for w, f in zip(words, freqs)}
    chosen = []
    for _ in range(k):
        cnt: collections.Counter = collections.Counter()
        excl = {p for p, _ in chosen}
        for syms, f in tab.items():
            parts = syms.split(" ")
            for a, b in zip(parts, parts[1:]):
                p = a + " " + b
                if p not in excl:
                    cnt[p] += f
        if not cnt:
            break
        pair = min(cnt, key=lambda p: (-cnt[p], p))
        chosen.append((pair, cnt[pair]))
        l, r = pair.split(" ")
        tab = {
            (" " + s + " ").replace(f" {l} {r} ", f" {l}{r} ").strip(): f
            for s, f in tab.items()
        }
    replay_sec = time.perf_counter() - t0

    got_list = [
        (f"{l} {r}", int(n))
        for l, r, n in zip(got["left"], got["right"], got["n"])
    ]
    rec = {
        "demo": "bpe_zipf_vocab",
        "n_words": n_words,
        "k": k,
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "pipeline_sec": round(run_sec, 2),
        "replay_sec": round(replay_sec, 2),
        "word_rounds_per_sec": round(n_words * k / run_sec, 1),
        "merges": got_list,
        "match": got_list == chosen,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
