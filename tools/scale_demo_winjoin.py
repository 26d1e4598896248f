"""Scale demonstration for the banded interval join (window_bounds).

Synthesizes a 10M-event corpus (1M users, clicks + purchases, plus one
mega-user owning 5% of all traffic — the bot shape) and runs the
merge-rank window join end-to-end, checking a sampled brute-force
parity and reporting throughput. The kernel is O((P+C) log(P+C)) per
bucket, so the mega-user costs its share of rows, not its square.

Usage: python tools/scale_demo_winjoin.py [n_events] [n_users]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    rng = np.random.default_rng(13)
    n_mega = n // 20  # one user owns 5% of all events
    users = np.concatenate(
        [np.zeros(n_mega, dtype=np.int64),
         rng.integers(1, n_users, n - n_mega).astype(np.int64)]
    )
    ts = rng.integers(0, 30 * 86_400_000_000, n).astype("datetime64[us]")
    etype = np.where(rng.random(n) < 0.7, "click", "purchase")
    value = np.round(rng.uniform(0.01, 500.0, n), 2)
    t_build = time.time()
    tbl = pa.table({
        "event_id": np.arange(n, dtype=np.int64), "user_id": users,
        "ts": ts, "event_type": etype, "value": value,
    })
    src = "/tmp/winjoin_demo"
    import shutil

    shutil.rmtree(src, ignore_errors=True)
    rd.from_arrow(tbl).repartition(128).write_parquet(src)
    t_build = time.time() - t_build

    # point the pipeline at the synthetic table via a temp sf-dir layout
    sf_dir = "/tmp/winjoin_sf"
    shutil.rmtree(sf_dir, ignore_errors=True)
    os.makedirs(sf_dir)
    import pyarrow.parquet as pq

    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))

    from ocr_ray.pipelines.streaming import window_agg_join

    t0 = time.time()
    out = window_agg_join(sf_dir)
    t_join = time.time() - t0

    # sampled brute-force parity (50 purchases incl. the mega user)
    df = tbl.to_pandas()
    clicks = df[df["event_type"] == "click"]
    cen = np.round(clicks["value"].to_numpy() * 100).astype(np.int64)
    purchases = df[df["event_type"] == "purchase"]
    sample = pd.concat([
        purchases[purchases["user_id"] == 0].head(10),
        purchases.sample(40, random_state=2),
    ])
    ok = True
    got_idx = out.set_index("event_id")
    w = pd.Timedelta(seconds=86_400)
    for _, r in sample.iterrows():
        m = ((clicks["user_id"] == r["user_id"])
             & (clicks["ts"] >= r["ts"] - w)
             & (clicks["ts"] < r["ts"])).to_numpy()
        row = got_idx.loc[r["event_id"]]
        if row["n_clicks_24h"] != m.sum() or \
           abs(row["click_value_sum"] - cen[m].sum() / 100.0) > 1e-9:
            ok = False
            break

    mega_purchases = int((purchases["user_id"] == 0).sum())
    print(json.dumps({
        "n_events": n, "n_users": n_users,
        "mega_user_events": int(n_mega),
        "mega_user_purchases": mega_purchases,
        "n_purchases": int(len(out)),
        "join_sec": round(t_join, 3),
        "events_per_sec": round(n / t_join, 1),
        "sampled_parity_ok": bool(ok),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
