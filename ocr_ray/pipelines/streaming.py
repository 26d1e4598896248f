"""Stream-shaped operators over the ordered ``events`` log (SURVEY.md
§2.10: the reference is finite-batch; these are the engine's windowed
extensions, built the Ray-Data way — partition by key, order by ts within
partition, window inside map_groups).

Ordering assumption (stated per the guide): events are processed per
``user_id`` group sorted by ``ts``; output is independent of input block
order. Exact-cents math keeps the SQL twins bit-identical.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["tumbling_window", "session_windows", "asof_last_login"]

SESSION_GAP_MIN = 30


def _events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def tumbling_window(sf_dir: str) -> pd.DataFrame:
    """Per-user tumbling 1-hour windows: count + exact-cents sum.

    Window key computed vectorized in map_batches; the aggregation is the
    hash-bucketed grouped sum (high key cardinality)."""
    from ..stages.partial_agg import hash_bucket_sum

    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def widen(t: pa.Table) -> pa.Table:
        hour = pc.strftime(t["ts"], format="%Y-%m-%d %H:00:00")
        value_c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"].combine_chunks(), hour, value_c],
            names=["user_id", "window_start", "value_c"],
        )

    agg = hash_bucket_sum(
        ds.map_batches(widen, batch_format="pyarrow"),
        ["user_id", "window_start"],
        ["value_c"],
    ).to_pandas()
    agg["sum_value"] = agg["value_c"] / 100.0
    return agg[["user_id", "window_start", "n", "sum_value"]].sort_values(
        ["user_id", "window_start"]
    ).reset_index(drop=True)


def session_windows(sf_dir: str) -> pd.DataFrame:
    """Session windowing: per user, a new session starts when the gap to
    the previous event exceeds SESSION_GAP_MIN minutes. Emits one row per
    session: (user_id, session_start, n_events, duration_sec).

    groupby(user_id) + in-group ts sort + vectorized gap/cumsum — the
    map_groups stateful-window pattern."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy()
        gap = np.diff(ts) / np.timedelta64(1, "s")
        new_session = np.concatenate([[True], gap > SESSION_GAP_MIN * 60])
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame({"sid": sid, "ts": g["ts"].to_numpy()})
            .groupby("sid")
            .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                 n_events=("ts", "size"))
            .reset_index(drop=True)
        )
        out["user_id"] = g["user_id"].iloc[0]
        out["duration_sec"] = (
            (out["session_end"] - out["session_start"]).dt.total_seconds().astype(np.int64)
        )
        return out[["user_id", "session_start", "n_events", "duration_sec"]]

    res = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return res.sort_values(["user_id", "session_start"]).reset_index(drop=True)


def asof_last_login(sf_dir: str) -> pd.DataFrame:
    """As-of (backward) self-join: for every 'click' event, the timestamp
    of that user's most recent earlier-or-equal 'login' event.

    Composition: groupby(user_id) -> in-group sort -> pd.merge_asof (the
    documented as-of pattern: sort both sides within the key partition)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("ts", kind="mergesort")
        logins = g[g["event_type"] == "login"].sort_values("ts", kind="mergesort")
        if clicks.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "last_login_ts": pd.Series([], dtype="datetime64[us]")}
            )
        merged = pd.merge_asof(
            clicks[["event_id", "user_id", "ts"]],
            logins[["ts"]].rename(columns={"ts": "last_login_ts"}),
            left_on="ts", right_on="last_login_ts",
            direction="backward", allow_exact_matches=True,
        )
        return merged

    res = ds.groupby("user_id").map_groups(asof, batch_format="pandas").to_pandas()
    return res.sort_values("event_id").reset_index(drop=True)