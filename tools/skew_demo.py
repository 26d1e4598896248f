"""Hot-key skew demonstration for the salted join.

A web-scale corpus join routinely has one key holding a double-digit
share of all rows (a default value, an empty-string URL, a bot user).
A plain hash-bucket join lands that whole key in ONE task; the salted
join spreads it across `salt` sub-partitions and replicates only the
matching build rows.

This demo builds a LEFT side where one key owns 80% of n_rows and a
one-row-per-key RIGHT side, then runs plain bucket_hash_join vs
salted_bucket_join at the same parallelism and checks: identical output
row count (= n_rows for a 1:1 build side), identical per-key sums, and
wall time for each.

Usage: python tools/skew_demo.py [n_rows] [n_cold_keys] [salt]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_cold = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import pandas as pd
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_ray.pipelines.joins import (bucket_hash_join, detect_hot_keys,
                                         salted_bucket_join)

    rng = np.random.default_rng(11)
    n_hot = int(n_rows * 0.8)
    HOT = 999_999_999
    lk = np.concatenate(
        [np.full(n_hot, HOT, dtype=np.int64),
         rng.integers(0, n_cold, n_rows - n_hot).astype(np.int64)]
    )
    rng.shuffle(lk)
    left = pd.DataFrame({"k": lk, "lv": np.ones(n_rows, dtype=np.int64)})
    rk = np.concatenate([np.arange(n_cold, dtype=np.int64), [HOT]])
    right = pd.DataFrame({"k": rk, "rv": rk * 2})

    lds = rd.from_pandas(left).repartition(128).materialize()
    rds = rd.from_pandas(right).repartition(8).materialize()

    t0 = time.time()
    hot = detect_hot_keys(lds, "k", threshold=n_rows // 20)
    t_detect = time.time() - t0
    assert hot == [HOT], hot

    from ray.data.aggregate import Sum

    def keysum(ds):
        # pre-aggregate per block BEFORE the grouped shuffle — the
        # scale-correct downstream consumer (partial combiner)
        import pandas as pd

        def part(df):
            return df.groupby("k", as_index=False).agg(s=("rv", "sum"))

        return (
            ds.map_batches(part, batch_format="pandas")
            .groupby("k").aggregate(Sum("s", alias_name="s")).to_pandas()
            .sort_values("k").reset_index(drop=True)
        )

    # time the JOINS alone (count() forces full execution), then check
    # parity untimed. Both joins also get a DOWNSTREAM aggregate timed
    # separately: the salted join's output blocks are balanced, the
    # plain join's hot bucket emits one giant block that stalls any
    # consumer without a partial combiner.
    t0 = time.time()
    plain = bucket_hash_join(lds, rds, on="k").materialize()
    t_plain = time.time() - t0
    t0 = time.time()
    salted = salted_bucket_join(
        lds, rds, on="k", hot_keys=hot, salt=salt
    ).materialize()
    t_salted = time.time() - t0

    t0 = time.time()
    plain_sum = keysum(plain)
    t_plain_agg = time.time() - t0
    t0 = time.time()
    salted_sum = keysum(salted)
    t_salted_agg = time.time() - t0

    ok = plain_sum.equals(salted_sum)
    hot_share = float((lk == HOT).mean())
    print(json.dumps({
        "n_rows": n_rows, "n_cold_keys": n_cold, "salt": salt,
        "hot_share": hot_share, "detect_sec": round(t_detect, 3),
        "plain_join_sec": round(t_plain, 3),
        "salted_join_sec": round(t_salted, 3),
        "plain_downstream_agg_sec": round(t_plain_agg, 3),
        "salted_downstream_agg_sec": round(t_salted_agg, 3),
        "per_key_sums_equal": bool(ok),
        "n_out_rows": int(plain.count()),
        "n_out_keys": int(len(salted_sum)),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
