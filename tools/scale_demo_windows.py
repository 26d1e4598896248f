"""Scale/skew demonstration for the windowed-operator kernels.

The sf events tables are small (100k rows at sf0.1), so this synthesizes
a 10M-row event log with corpus-scale key cardinality PLUS one
mega-user holding 1M rows (10% of the corpus in a single partition key —
the skewed-key shape the hash-bucket kernels must absorb: the mega-user
lands in ONE bucket and is processed by the single vectorized pass).

Runs rolling_range_sum (RANGE time frame via the lexsort merge trick),
session_windows and events_user_type_count end-to-end and verifies the
rolling output against DuckDB's window engine on the identical file via
an exact integer-cents checksum (sum over all 10M window sums).

Usage: python tools/scale_demo_windows.py [n_rows] [n_users]
Prints one JSON line; run from the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_rows: int, n_users: int, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(11)
    n_mega = n_rows // 10  # one user owns 10% of the corpus
    users = np.concatenate([
        np.full(n_mega, 1, dtype=np.int64),
        rng.randint(2, n_users + 2, size=n_rows - n_mega).astype(np.int64),
    ])
    # timestamps over ~30 days, microsecond precision
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.randint(0, 30 * 86400 * 1_000_000, size=n_rows)
    value = np.round(rng.uniform(0, 100, size=n_rows), 2)
    types = np.array(["click", "view", "purchase", "login", "error"])
    etype = types[rng.randint(0, len(types), size=n_rows)]
    t = pa.table({
        "event_id": np.arange(n_rows, dtype=np.int64),
        "user_id": users,
        "ts": ts.astype("datetime64[us]"),
        "event_type": etype,
        "value": value,
    })
    pq.write_table(t, os.path.join(path, "events.parquet"))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # cache keyed by the requested size: re-running with different
    # n_rows/n_users must not report new labels over the old file
    work = f"/tmp/ocr_ray_windemo_{n_rows}_{n_users}"
    os.makedirs(work, exist_ok=True)
    if not os.path.exists(os.path.join(work, "events.parquet")):
        build(n_rows, n_users, work)

    from ocr_ray.pipelines.relational import events_user_type_count
    from ocr_ray.pipelines.streaming import (
        band_pair_counts,
        rolling_range_sum,
        session_windows,
    )

    out = {"n_rows": n_rows, "n_users": n_users, "mega_user_rows": n_rows // 10}

    t0 = time.perf_counter()
    roll = rolling_range_sum(work)
    out["rolling_range_sec"] = round(time.perf_counter() - t0, 2)
    got_sum = int(np.round(roll["window_sum"].to_numpy() * 100).astype(np.int64).sum())
    out["rolling_rows"] = len(roll)
    del roll

    t0 = time.perf_counter()
    sess = session_windows(work)
    out["sessions_sec"] = round(time.perf_counter() - t0, 2)
    out["n_sessions"] = len(sess)
    del sess

    t0 = time.perf_counter()
    utc = events_user_type_count(work)
    out["type_count_sec"] = round(time.perf_counter() - t0, 2)
    out["n_user_rows"] = len(utc)
    del utc

    t0 = time.perf_counter()
    band = band_pair_counts(work)
    out["band_sec"] = round(time.perf_counter() - t0, 2)
    out["band_users"] = len(band)
    got_pairs = int(band["n_pairs"].sum())
    got_mega_pairs = int(band.loc[band["user_id"] == 1, "n_pairs"].sum())
    del band

    t0 = time.perf_counter()
    con = duckdb.connect()
    exp_sum, exp_n = con.execute(f"""
        SELECT CAST(sum(w) AS HUGEINT), count(*) FROM (
          SELECT sum(CAST(round(value*100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
                 ) AS w
          FROM '{work}/events.parquet')
    """).fetchone()
    out["duckdb_verify_sec"] = round(time.perf_counter() - t0, 2)
    out["rolling_checksum_match"] = bool(got_sum == int(exp_sum)
                                         and len_ok(out["rolling_rows"], exp_n))
    out["rows_per_sec_rolling"] = round(n_rows / out["rolling_range_sec"], 1)

    # band-join verify WITHOUT materializing the pair set on either side:
    # strict pairs-per-row = (rows in [ts, ts+12h]) - (peer rows at ts),
    # both O(n log n) window counts in DuckDB
    t0 = time.perf_counter()
    exp_pairs, exp_mega = con.execute(f"""
        SELECT CAST(sum(w_total - w_peers) AS HUGEINT),
               CAST(sum(CASE WHEN user_id = 1 THEN w_total - w_peers
                        ELSE 0 END) AS HUGEINT)
        FROM (
          SELECT user_id,
                 count(*) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN CURRENT ROW
                   AND INTERVAL 12 HOURS FOLLOWING) AS w_total,
                 count(*) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE CURRENT ROW) AS w_peers
          FROM '{work}/events.parquet')
    """).fetchone()
    out["duckdb_band_verify_sec"] = round(time.perf_counter() - t0, 2)
    out["band_pairs"] = got_pairs
    out["band_mega_user_pairs"] = got_mega_pairs
    out["band_checksum_match"] = bool(got_pairs == int(exp_pairs)
                                      and got_mega_pairs == int(exp_mega))
    out["rows_per_sec_band"] = round(n_rows / out["band_sec"], 1)

    # cohort retention: the mega-user's 1M rows shrink to <=30 distinct
    # (user, day) rows in the block-local dedup before the one shuffle
    from ocr_ray.pipelines.streaming import retention_cohorts

    t0 = time.perf_counter()
    ret = retention_cohorts(work)
    out["retention_sec"] = round(time.perf_counter() - t0, 2)
    out["retention_cells"] = len(ret)
    exp_ret = con.execute(f"""
        WITH a AS (
          SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
          FROM '{work}/events.parquet'
        ), f AS (
          SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id
        )
        SELECT f.cohort_day,
               CAST(datediff('day', CAST(f.cohort_day AS DATE),
                             CAST(a.day AS DATE)) AS BIGINT) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN f ON a.user_id = f.user_id
        WHERE datediff('day', CAST(f.cohort_day AS DATE),
                       CAST(a.day AS DATE)) <= 7
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    out["retention_match"] = bool(
        len(ret) == len(exp_ret)
        and (ret["n_users"].to_numpy() == exp_ret["n_users"].to_numpy()).all()
        and (ret["cohort_day"].to_numpy() == exp_ret["cohort_day"].to_numpy()).all()
        and (ret["day_offset"].to_numpy()
             == exp_ret["day_offset"].to_numpy()).all()
    )
    out["rows_per_sec_retention"] = round(n_rows / out["retention_sec"], 1)
    print(json.dumps(out))
    ray.shutdown()
    return 0 if (out["rolling_checksum_match"]
                 and out["band_checksum_match"]
                 and out["retention_match"]) else 1


def len_ok(a, b) -> bool:
    return int(a) == int(b)


if __name__ == "__main__":
    raise SystemExit(main())
