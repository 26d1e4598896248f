"""Tests for the round-3 set-op / data-mixing / contamination-score /
rollup / sufficient-stats operators (their SQL twins are exercised by
tools/check_queries.py; these pin semantics on synthetic edges)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _events(n=2000, n_users=200, seed=5):
    rng = np.random.RandomState(seed)
    types = np.array(["click", "view", "purchase", "error"])
    return pd.DataFrame(
        {"user_id": rng.randint(0, n_users, n).astype(np.int64),
         "event_type": types[rng.randint(0, len(types), n)]}
    )


def test_distinct_set_op_matches_pandas(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.joins import distinct_set_op

    df = _events()
    a = rd.from_pandas(df[df["event_type"] == "click"][["user_id"]].reset_index(drop=True)).repartition(5)
    b = rd.from_pandas(df[df["event_type"] == "purchase"][["user_id"]].reset_index(drop=True)).repartition(3)

    sa = set(df.loc[df["event_type"] == "click", "user_id"])
    sb = set(df.loc[df["event_type"] == "purchase", "user_id"])

    inter = sorted(distinct_set_op(a, b, on="user_id").to_pandas()["user_id"])
    assert inter == sorted(sa & sb)

    exc = sorted(distinct_set_op(a, b, on="user_id", anti=True).to_pandas()["user_id"])
    assert exc == sorted(sa - sb)
    # distinct semantics: no key appears twice
    assert len(inter) == len(set(inter)) and len(exc) == len(set(exc))


def test_rebalance_by_group_rates_and_determinism(ray_session):
    import ray.data as rd

    from ocr_ray.functions.sampling import key_hash64, rebalance_by_group

    rng = np.random.RandomState(7)
    langs = np.array(["en"] * 800 + ["de"] * 150 + ["zh"] * 50)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(langs), dtype=np.int64), "lang": langs}
    )
    out = (
        rebalance_by_group(rd.from_pandas(df).repartition(4), "lang", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # subset of the input, rerun/partition independent
    out2 = (
        rebalance_by_group(rd.from_pandas(df.sample(frac=1, random_state=1)), "lang", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    assert set(out["doc_id"]).issubset(set(df["doc_id"]))

    # per-group kept counts match the exact integer-threshold predicate
    counts = df.groupby("lang").size()
    mc = int(counts.min())
    for lang, cnt in counts.items():
        th = (mc * 1_000_000) // int(cnt)
        ids = df.loc[df["lang"] == lang, "doc_id"].to_numpy()
        expect = int(
            ((key_hash64(ids) % np.uint64(1_000_000)) < th).sum()
        )
        assert (out["lang"] == lang).sum() == expect
    # minority group keeps everything (threshold == scale)
    assert (out["lang"] == "zh").sum() == mc


def test_contamination_scores_counts(ray_session):
    import ray.data as rd

    from ocr_ray.functions.dedup import contamination_scores

    bench = pd.DataFrame({"doc_id": [100], "text": ["a b c d"]})  # shingles: abc bcd
    cand = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4],
         "text": [
             "a b c d e",        # shingles abc bcd cde -> matched 2 / 3
             "x y z w",          # 2 shingles, matched 0
             "a b c",            # 1 shingle, matched 1
             "hi",               # <3 tokens -> absent from output
         ]}
    )
    out = (
        contamination_scores(rd.from_pandas(cand).repartition(3), rd.from_pandas(bench))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["matched"]) == [2, 0, 1]
    assert list(out["total"]) == [3, 2, 1]


def test_lineitem_rollup_levels_consistent(ray_session):
    from ocr_ray.pipelines.relational import lineitem_rollup

    out = lineitem_rollup("/root/testdata/sf0.001")
    fine = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] != "ALL")]
    lvl1 = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] == "ALL")]
    total = out[(out["l_returnflag"] == "ALL") & (out["l_linestatus"] == "ALL")]
    assert len(total) == 1
    assert np.isclose(fine["sum_qty"].sum(), float(total["sum_qty"].iloc[0]))
    assert fine["n"].sum() == int(total["n"].iloc[0])
    for flag, g in fine.groupby("l_returnflag"):
        row = lvl1[lvl1["l_returnflag"] == flag]
        assert int(g["n"].sum()) == int(row["n"].iloc[0])


def test_events_corr_stats_matches_numpy(ray_session):
    import re

    import pyarrow.parquet as pq

    from ocr_ray.money import cents_np
    from ocr_ray.pipelines.relational import events_corr_stats

    out = events_corr_stats("/root/testdata/sf0.001")
    assert ((out["corr_vk"] >= -1.0) & (out["corr_vk"] <= 1.0)).all()

    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_type", "value", "props"]).to_pandas()
    k_re = re.compile(r'"k":\s*(\d+)')
    t["x"] = cents_np(t["value"].to_numpy())
    t["y"] = [int(m.group(1)) if (m := k_re.search(p or "")) else 0
              for p in t["props"]]
    for _, row in out.iterrows():
        g = t[t["event_type"] == row["event_type"]]
        expect = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(row["corr_vk"] - expect) < 1e-9


def test_transition_counts_matches_pandas(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.streaming import transition_counts

    rng = np.random.RandomState(3)
    n = 3000
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64),
         "user_id": rng.randint(0, 40, n).astype(np.int64),
         "ts": pd.to_datetime("2024-01-01")
               + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
         "event_type": np.array(["a", "b", "c"])[rng.randint(0, 3, n)]}
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = transition_counts(str(tmp_path))

    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    same = s["user_id"].to_numpy()[1:] == s["user_id"].to_numpy()[:-1]
    et = s["event_type"].to_numpy()
    brute = (
        pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
        .groupby(["prev_type", "next_type"], as_index=False).size()
        .rename(columns={"size": "n"})
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    )
    brute["n"] = brute["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, brute)
    assert out["n"].sum() == same.sum()


def test_rare_terms_ranks_by_df(ray_session):
    import ray.data as rd

    from ocr_ray.functions.textstats import rare_terms

    docs = pd.DataFrame(
        {"doc_id": np.array([0, 1, 2], dtype=np.int64),
         "text": ["common alpha beta", "common alpha gamma", "common delta"]}
    )
    out = (
        rare_terms(rd.from_pandas(docs).repartition(2), n=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # df: common=3, alpha=2, beta/gamma/delta=1
    d0 = out[out["doc_id"] == 0]
    assert list(d0["tok"]) == ["beta", "alpha"]
    assert list(d0["df"]) == [1, 2]
    d2 = out[out["doc_id"] == 2]
    assert list(d2["tok"]) == ["delta", "common"]


def test_q5_shape(ray_session):
    from ocr_ray.pipelines.joins import q5_local_supplier_volume

    out = q5_local_supplier_volume("/root/testdata/sf0.001")
    assert (out["revenue"] > 0).all()
    assert out["n_name"].is_unique


def test_events_pruned_scan_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.money import cents_np
    from ocr_ray.pipelines.relational import events_pruned_scan

    out = events_pruned_scan("/root/testdata/sf0.001")
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "event_type", "value"]).to_pandas()
    t = t[t["event_type"] == "purchase"]
    brute = (
        t.assign(day=t["ts"].dt.strftime("%Y-%m-%d"),
                 value_c=cents_np(t["value"].to_numpy()))
        .groupby("day", as_index=False)
        .agg(n=("value_c", "size"), value_c=("value_c", "sum"))
    )
    brute["sum_value"] = brute["value_c"] / 100.0
    brute["n"] = brute["n"].astype(np.int64)
    brute = brute[["day", "n", "sum_value"]].sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, brute)
