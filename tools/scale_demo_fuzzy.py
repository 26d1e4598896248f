"""Scale demonstration for the PassJoin edit-distance join
(``functions.fuzzy.edit_distance_join``).

Synthesizes a record-linkage-shaped workload far above the query SFs:
N build strings (~40 chars, random lowercase), and a probe side made of
(a) one deterministic single-edit variant per build string in a sampled
subset (substitution / deletion / insertion round-robin — the true
match set, known by construction) and (b) pure-random distractors that
should match nothing. Runs the join end-to-end on Ray, then checks:

  - every planted variant pair is found with the exact expected
    distance (recall == 1 on the planted set);
  - no distractor matches anything (precision on the random background
    — a 40-char random string is ~never within distance 2 of another);
  - throughput: strings/sec through candidate generation + verify.

The corpus is segment-uniform (random strings share no 13-char
segments), so bucket sizes are bounded by hash-key frequency — the
demo measures the join's fixed machinery at volume, not a semantic
all-pairs cluster (a near-duplicate CLUSTER legitimately has quadratic
output; that shape is covered by the LSH families).

Usage: python tools/scale_demo_fuzzy.py [n_build] [n_planted] [n_noise]
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

_ALPHA = np.array(list("abcdefghijklmnopqrstuvwxyz"), dtype=object)


def build(n_build: int, n_planted: int, n_noise: int):
    rng = np.random.RandomState(13)
    mat = rng.randint(0, 26, size=(n_build, 40))
    strs = ["".join(_ALPHA[row]) for row in mat]
    left = pd.DataFrame({"doc_id": np.arange(n_build, dtype=np.int64),
                         "s": strs})
    probes = []
    expect = []  # (doc_id, vid, dist)
    for j in range(n_planted):
        i = int(rng.randint(0, n_build))
        s = strs[i]
        kind = j % 3
        if kind == 0:
            pos = int(rng.randint(0, 40))
            c = "z" if s[pos] != "z" else "q"
            v = s[:pos] + c + s[pos + 1:]
        elif kind == 1:
            pos = int(rng.randint(0, 40))
            v = s[:pos] + s[pos + 1:]
        else:
            pos = int(rng.randint(0, 41))
            v = s[:pos] + "z" + s[pos:]
        probes.append(v)
        expect.append((i, j, 0 if v == s else 1))
    noise_mat = rng.randint(0, 26, size=(n_noise, 40))
    probes += ["".join(_ALPHA[row]) for row in noise_mat]
    right = pd.DataFrame({"vid": np.arange(len(probes), dtype=np.int64),
                          "s": probes})
    return left, right, expect


def main() -> None:
    n_build = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_noise = int(sys.argv[3]) if len(sys.argv) > 3 else 480_000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    t0 = time.perf_counter()
    left, right, expect = build(n_build, n_planted, n_noise)
    gen_sec = time.perf_counter() - t0

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.functions.fuzzy import edit_distance_join

    lds = rd.from_arrow(
        pa.Table.from_pandas(left, preserve_index=False)
    ).repartition(ncpu * 2).materialize()
    rds = rd.from_arrow(
        pa.Table.from_pandas(right, preserve_index=False)
    ).repartition(ncpu * 2).materialize()

    t0 = time.perf_counter()
    out = edit_distance_join(lds, rds, left_id="doc_id", right_id="vid",
                             k=2, n_buckets=128).to_pandas()
    run_sec = time.perf_counter() - t0

    got = {(int(a), int(b)): int(d) for a, b, d in
           zip(out["doc_id"], out["vid"], out["dist"])}
    planted_found = sum(
        1 for (i, j, d) in expect if got.get((i, j)) == d
    )
    # matches involving noise probes (vid >= n_planted) that are not a
    # freak true near-match: count them; expected ~0
    noise_matches = int((out["vid"] >= n_planted).sum())
    rec = {
        "demo": "fuzzy_join_planted_edits",
        "n_build": n_build,
        "n_probe": n_planted + n_noise,
        "n_planted": n_planted,
        "num_cpus": ncpu,
        "gen_sec": round(gen_sec, 2),
        "join_sec": round(run_sec, 2),
        "strings_per_sec": round((n_build + n_planted + n_noise) / run_sec, 1),
        "pairs_out": int(len(out)),
        "planted_recall": round(planted_found / len(expect), 6),
        "noise_matches": noise_matches,
        "match": planted_found == len(expect),
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
