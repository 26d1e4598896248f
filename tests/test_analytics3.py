"""Round-3 continuation operators (cohort retention, time-part heatmap,
3-sigma outliers, TPC-H Q3/Q6) vs brute-force pandas on sf0.001."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(SF, f"{name}.parquet")).to_pandas()


def test_retention_cohorts(ray_session):
    from ocr_ray.pipelines.streaming import RETENTION_MAX_OFFSET, retention_cohorts

    got = retention_cohorts(SF)
    ev = _tbl("events")
    a = pd.DataFrame(
        {"user_id": ev["user_id"], "day": ev["ts"].dt.strftime("%Y-%m-%d")}
    ).drop_duplicates()
    cohort = pd.to_datetime(a.groupby("user_id")["day"].transform("min"))
    off = (pd.to_datetime(a["day"]) - cohort).dt.days
    keep = off <= RETENTION_MAX_OFFSET
    exp = (
        pd.DataFrame(
            {"cohort_day": cohort[keep].dt.strftime("%Y-%m-%d"),
             "day_offset": off[keep]}
        )
        .groupby(["cohort_day", "day_offset"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every cohort has an offset-0 cell counting its own size
    day0 = got[got["day_offset"] == 0]
    assert set(day0["cohort_day"]) == set(got["cohort_day"])


def test_events_dow_hour(ray_session):
    from ocr_ray.pipelines.relational import events_dow_hour

    got = events_dow_hour(SF)
    ev = _tbl("events")
    exp = (
        pd.DataFrame(
            {"dow": (ev["ts"].dt.dayofweek + 1) % 7,  # pandas Mon=0 -> Sun=0
             "hour": ev["ts"].dt.hour,
             "value_c": np.round(ev["value"] * 100).astype(np.int64)}
        )
        .groupby(["dow", "hour"], as_index=False)
        .agg(n=("value_c", "size"), sum_c=("value_c", "sum"))
    )
    exp["sum_value"] = exp["sum_c"] / 100.0
    exp = exp[["dow", "hour", "n", "sum_value"]].sort_values(
        ["dow", "hour"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_zscore_outliers(ray_session):
    from ocr_ray.pipelines.relational import events_zscore_outliers

    got = events_zscore_outliers(SF)
    ev = _tbl("events")
    v = np.round(ev["value"] * 100).astype(np.int64)
    g = pd.DataFrame({"t": ev["event_type"], "v": v}).groupby("t")["v"]
    n = g.transform("size").to_numpy(np.int64)
    s = g.transform("sum").to_numpy(np.int64)
    q = (
        pd.DataFrame({"t": ev["event_type"], "v2": v * v})
        .groupby("t")["v2"].transform("sum").to_numpy(np.int64)
    )
    lhs = (v.to_numpy() * n - s).astype(np.float64)
    rhs = 9.0 * (n.astype(np.float64) * q.astype(np.float64)
                 - s.astype(np.float64) ** 2)
    exp = ev[lhs * lhs > rhs][["event_id", "event_type", "value"]].sort_values(
        "event_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) > 0  # the synthetic value column has a heavy tail


def test_lineitem_q6(ray_session):
    from ocr_ray.pipelines.relational import lineitem_q6

    got = lineitem_q6(SF)
    li = _tbl("lineitem")
    disc_c = np.round(li["l_discount"] * 100).astype(np.int64)
    keep = (
        (li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1997-01-01")
        & (disc_c >= 5) & (disc_c <= 7) & (li["l_quantity"] < 24)
    )
    price_c = np.round(li.loc[keep, "l_extendedprice"] * 100).astype(np.int64)
    rev = float((price_c * disc_c[keep]).sum()) / 10000.0
    assert got.loc[0, "n_items"] == int(keep.sum())
    assert got.loc[0, "revenue"] == rev


def test_q3_shipping_priority(ray_session):
    from ocr_ray.pipelines.joins import Q3_CUTOFF, q3_shipping_priority

    got = q3_shipping_priority(SF)
    li, orders, cust = _tbl("lineitem"), _tbl("orders"), _tbl("customer")
    cut = pd.Timestamp(Q3_CUTOFF)
    li = li[li["l_shipdate"] > cut].copy()
    li["rev_c4"] = np.round(li["l_extendedprice"] * 100).astype(np.int64) * (
        100 - np.round(li["l_discount"] * 100).astype(np.int64)
    )
    agg = li.groupby("l_orderkey", as_index=False)["rev_c4"].sum()
    keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = orders[(orders["o_orderdate"] < cut) & orders["o_custkey"].isin(keys)]
    j = agg.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    exp = j.sort_values(
        ["rev_c4", "o_orderdate", "o_orderkey"], ascending=[False, True, True]
    ).head(10)
    exp["revenue"] = exp["rev_c4"] / 10000.0
    exp = exp[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_value_hist(ray_session):
    from ocr_ray.pipelines.relational import HIST_BIN_C, events_value_hist

    got = events_value_hist(SF)
    ev = _tbl("events")
    v_c = np.round(ev["value"] * 100).astype(np.int64)
    exp = (
        pd.DataFrame({"bin": v_c // HIST_BIN_C, "value_c": v_c, "v": ev["value"]})
        .groupby("bin", as_index=False)
        .agg(n=("v", "size"), sum_c=("value_c", "sum"),
             vmin=("v", "min"), vmax=("v", "max"))
    )
    exp["sum_value"] = exp["sum_c"] / 100.0
    exp = exp[["bin", "n", "sum_value", "vmin", "vmax"]].sort_values(
        "bin"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["bin"] >= 0).all() and got["n"].sum() == len(ev)


def test_orders_monthly_growth(ray_session):
    from ocr_ray.pipelines.relational import orders_monthly_growth

    got = orders_monthly_growth(SF)
    o = _tbl("orders")
    exp = (
        pd.DataFrame(
            {"month": o["o_orderdate"].dt.strftime("%Y-%m"),
             "price_c": np.round(o["o_totalprice"] * 100).astype(np.int64)}
        )
        .groupby("month", as_index=False)
        .agg(n_orders=("price_c", "size"), rev_c=("price_c", "sum"))
        .sort_values("month")
        .reset_index(drop=True)
    )
    exp["revenue"] = exp["rev_c"] / 100.0
    exp["prev_revenue"] = exp["revenue"].shift(1)
    pd.testing.assert_frame_equal(
        got, exp[["month", "n_orders", "revenue", "prev_revenue"]],
        check_dtype=False,
    )
    assert pd.isna(got.loc[0, "prev_revenue"])


def test_inverted_index(ray_session):
    from collections import Counter

    from ocr_ray.functions.retrieval import inverted_index

    import ray.data as rd

    docs = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"])
    got = inverted_index(docs, min_df=3).to_pandas().sort_values(
        "term"
    ).reset_index(drop=True)

    d = _tbl("documents")
    rows = []
    for did, txt in zip(d["doc_id"], d["text"]):
        for term, tf in Counter((txt or "").lower().split()).items():
            rows.append((term, did, tf))
    tf = pd.DataFrame(rows, columns=["term", "doc_id", "tf"]).sort_values(
        ["term", "doc_id"]
    )
    exp = tf.groupby("term").agg(df=("doc_id", "size"), total_tf=("tf", "sum"))
    exp["postings"] = (
        tf.assign(s=tf["doc_id"].astype(str)).groupby("term")["s"].agg(",".join)
    )
    exp = exp[exp["df"] >= 3].reset_index().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # posting lists are strictly ascending per term
    for p in got["postings"]:
        ids = [int(x) for x in p.split(",")]
        assert ids == sorted(set(ids))


def test_docs_longest_per_lang(ray_session):
    from ocr_ray.pipelines.relational import docs_longest_per_lang

    got = docs_longest_per_lang(SF)
    d = _tbl("documents")
    exp = (
        d.sort_values(["lang", "n_chars", "doc_id"],
                      ascending=[True, False, True])
        .groupby("lang", as_index=False)
        .first()[["lang", "doc_id", "n_chars"]]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_type_share(ray_session):
    from ocr_ray.pipelines.relational import events_type_share

    got = events_type_share(SF)
    assert abs(got["share"].sum() - 1.0) < 1e-12
    ev = _tbl("events")
    v_c = np.round(ev["value"] * 100).astype(np.int64)
    agg = pd.DataFrame({"t": ev["event_type"], "v": v_c}).groupby(
        "t", as_index=False
    )["v"].sum()
    exp_share = agg["v"].astype(np.float64) / float(agg["v"].sum())
    assert np.array_equal(got.sort_values("event_type")["share"].to_numpy(),
                          exp_share.to_numpy())


def test_q3_above_gate_join_path(ray_session, monkeypatch):
    """Force the cogroup/bucket-join path (broadcast gate at 0) and pin
    it to the broadcast path's output."""
    from ocr_ray.pipelines import joins

    fast = joins.q3_shipping_priority(SF)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    slow = joins.q3_shipping_priority(SF)
    pd.testing.assert_frame_equal(fast, slow)


def test_window_distinct_users(ray_session):
    from ocr_ray.pipelines.streaming import window_distinct_users

    got = window_distinct_users(SF)
    ev = _tbl("events")
    exp = (
        pd.DataFrame(
            {"window_start": ev["ts"].dt.strftime("%Y-%m-%d %H:00:00"),
             "user_id": ev["user_id"]}
        )
        .drop_duplicates()
        .groupby("window_start", as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_first_touch_attribution(ray_session):
    from ocr_ray.pipelines.streaming import first_touch_attribution

    got = first_touch_attribution(SF)
    ev = _tbl("events").sort_values(["user_id", "ts", "event_id"])
    first = ev.groupby("user_id", as_index=False).first()[
        ["user_id", "event_type"]
    ].rename(columns={"event_type": "first_type"})
    purch = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id", as_index=False).size()
    )
    j = first.merge(purch, on="user_id", how="left").fillna({"size": 0})
    exp = j.groupby("first_type", as_index=False).agg(
        n_users=("user_id", "size"),
        n_purchasers=("size", lambda v: int((v > 0).sum())),
    ).sort_values("first_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_users"].sum() == ev["user_id"].nunique()


def _write_events(tmp_path, n_users, n_rows, seed):
    rng = np.random.RandomState(seed)
    import pyarrow as pa
    import pyarrow.parquet as pq_

    ts = (np.datetime64("2024-01-01", "us")
          + rng.randint(0, 20 * 86400_000_000, size=n_rows).astype("timedelta64[us]"))
    t = pa.table({
        "event_id": np.arange(n_rows, dtype=np.int64),
        "user_id": rng.randint(0, n_users, size=n_rows).astype(np.int64),
        "ts": ts,
        "event_type": np.array(["click", "purchase", "view"])[
            rng.randint(0, 3, size=n_rows)
        ],
        "value": np.round(rng.uniform(0, 100, size=n_rows), 2),
    })
    pq_.write_table(t, os.path.join(str(tmp_path), "events.parquet"),
                    row_group_size=max(8, n_rows // 7))  # force many blocks


def test_retention_cross_block_users(ray_session, tmp_path):
    """Users deliberately split across many parquet row groups: the
    bucket fold must reconstruct each user's true cohort day across
    blocks (a block-local min is NOT the cohort)."""
    from ocr_ray.pipelines.streaming import retention_cohorts

    for seed in (0, 1, 2):
        d = tmp_path / f"s{seed}"
        d.mkdir()
        _write_events(d, n_users=13, n_rows=400, seed=seed)
        got = retention_cohorts(str(d))
        ev = pd.read_parquet(d / "events.parquet")
        a = pd.DataFrame({"user_id": ev["user_id"],
                          "day": ev["ts"].dt.strftime("%Y-%m-%d")}).drop_duplicates()
        cohort = pd.to_datetime(a.groupby("user_id")["day"].transform("min"))
        off = (pd.to_datetime(a["day"]) - cohort).dt.days
        keep = off <= 7
        exp = (
            pd.DataFrame({"cohort_day": cohort[keep].dt.strftime("%Y-%m-%d"),
                          "day_offset": off[keep]})
            .groupby(["cohort_day", "day_offset"], as_index=False).size()
            .rename(columns={"size": "n_users"})
            .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_first_touch_cross_block_users(ray_session, tmp_path):
    """The true first event and the purchase totals must combine across
    blocks: a user whose earliest event and whose purchases live in
    different row groups exercises the partial/final split."""
    from ocr_ray.pipelines.streaming import first_touch_attribution

    for seed in (3, 4):
        d = tmp_path / f"s{seed}"
        d.mkdir()
        _write_events(d, n_users=7, n_rows=300, seed=seed)
        got = first_touch_attribution(str(d))
        ev = pd.read_parquet(d / "events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        first = ev.groupby("user_id", as_index=False).first()[
            ["user_id", "event_type"]
        ].rename(columns={"event_type": "first_type"})
        purch = (ev[ev["event_type"] == "purchase"]
                 .groupby("user_id", as_index=False).size())
        j = first.merge(purch, on="user_id", how="left").fillna({"size": 0})
        exp = j.groupby("first_type", as_index=False).agg(
            n_users=("user_id", "size"),
            n_purchasers=("size", lambda v: int((v > 0).sum())),
        ).sort_values("first_type").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _cents_s(s: pd.Series) -> np.ndarray:
    v = s.to_numpy(np.float64) * 100
    return (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)


def test_q7_nation_flows(ray_session):
    from ocr_ray.pipelines.joins import q7_nation_flows

    got = q7_nation_flows(SF)
    li, orders = _tbl("lineitem"), _tbl("orders")
    supp, cust, nat = _tbl("supplier"), _tbl("customer"), _tbl("nation")
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    df = li.merge(supp, left_on="l_suppkey", right_on="s_suppkey").merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    ).merge(cust, left_on="o_custkey", right_on="c_custkey")
    df = df[df["s_nationkey"] != df["c_nationkey"]]
    df["rev_c4"] = _cents_s(df["l_extendedprice"]) * (
        100 - _cents_s(df["l_discount"])
    )
    exp = (
        pd.DataFrame(
            {"supp_nation": df["s_nationkey"].map(names),
             "cust_nation": df["c_nationkey"].map(names),
             "l_year": df["l_shipdate"].dt.year.astype(np.int64),
             "rev_c4": df["rev_c4"]}
        )
        .groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)
        .agg(rev_c4=("rev_c4", "sum"))
    )
    exp["revenue"] = exp["rev_c4"] / 10000.0
    exp = exp.drop(columns="rev_c4").sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_q14_promo_effect(ray_session):
    from ocr_ray.pipelines.joins import Q14_FROM, Q14_TO, q14_promo_effect

    got = q14_promo_effect(SF)
    li = _tbl("lineitem")
    part = _tbl("part")
    li = li[(li["l_shipdate"] >= Q14_FROM) & (li["l_shipdate"] < Q14_TO)]
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    rev = _cents_s(df["l_extendedprice"]) * (100 - _cents_s(df["l_discount"]))
    promo = int(rev[(df["p_type"] == "PROMO").to_numpy()].sum())
    total = int(rev.sum())
    assert got["n_items"].iloc[0] == len(df)
    assert got["promo_revenue"].iloc[0] == promo / 10000.0
    assert got["total_revenue"].iloc[0] == total / 10000.0
    assert got["promo_pct"].iloc[0] == 100.0 * promo / total


def test_q18_big_orders(ray_session):
    from ocr_ray.pipelines.joins import Q18_MIN_QTY, q18_big_orders

    got = q18_big_orders(SF, k=100)
    li, orders, cust = _tbl("lineitem"), _tbl("orders"), _tbl("customer")
    qty = li.groupby("l_orderkey", as_index=False).agg(
        sum_qty=("l_quantity", "sum")
    )
    qty = qty[qty["sum_qty"] > Q18_MIN_QTY]
    df = qty.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    df["price_c"] = _cents_s(df["o_totalprice"])
    df = df.sort_values(["price_c", "o_orderkey"],
                        ascending=[False, True]).head(100)
    exp = pd.DataFrame(
        {"c_name": df["c_name"], "o_custkey": df["o_custkey"].astype(np.int64),
         "o_orderkey": df["o_orderkey"].astype(np.int64),
         "o_orderdate": df["o_orderdate"].dt.strftime("%Y-%m-%d"),
         "total_price": df["price_c"] / 100.0,
         "sum_qty": df["sum_qty"].astype(np.int64)}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_q10_returned_items(ray_session):
    from ocr_ray.pipelines.joins import Q10_FROM, Q10_TO, q10_returned_items

    got = q10_returned_items(SF, k=20)
    li, orders = _tbl("lineitem"), _tbl("orders")
    cust, nat = _tbl("customer"), _tbl("nation")
    li = li[li["l_returnflag"] == "R"]
    orders = orders[(orders["o_orderdate"] >= Q10_FROM)
                    & (orders["o_orderdate"] < Q10_TO)]
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    df["rev_c4"] = _cents_s(df["l_extendedprice"]) * (
        100 - _cents_s(df["l_discount"])
    )
    g = df.groupby("o_custkey", as_index=False).agg(rev_c4=("rev_c4", "sum"))
    g = g.sort_values(["rev_c4", "o_custkey"],
                      ascending=[False, True]).head(20)
    cd = cust.set_index("c_custkey")
    exp = pd.DataFrame(
        {"c_custkey": g["o_custkey"].astype(np.int64),
         "c_name": g["o_custkey"].map(cd["c_name"]),
         "n_name": g["o_custkey"].map(cd["c_nationkey"]).map(
             nat.set_index("n_nationkey")["n_name"]),
         "revenue": g["rev_c4"] / 10000.0}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_q22_dormant_customers(ray_session):
    from ocr_ray.pipelines.joins import Q22_CUTOFF, q22_dormant_customers

    got = q22_dormant_customers(SF)
    cust, orders = _tbl("customer"), _tbl("orders")
    bal_c = _cents_s(cust["c_acctbal"])
    pos = cust["c_acctbal"] > 0.0
    s, n = int(bal_c[pos.to_numpy()].sum()), int(pos.sum())
    active = set(orders.loc[orders["o_orderdate"] >= Q22_CUTOFF, "o_custkey"])
    keep = (bal_c * n > s) & ~cust["c_custkey"].isin(active).to_numpy()
    cand = pd.DataFrame(
        {"c_mktsegment": cust["c_mktsegment"][keep], "bal_c": bal_c[keep]}
    )
    assert len(cand) > 0  # cutoff chosen so the anti-join is non-trivial
    exp = cand.groupby("c_mktsegment", as_index=False).agg(
        n_cust=("bal_c", "size"), bal_c=("bal_c", "sum")
    )
    exp["total_acctbal"] = exp["bal_c"] / 100.0
    exp = exp.drop(columns="bal_c").sort_values("c_mktsegment").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_spearman(ray_session):
    from ocr_ray.pipelines.relational import events_spearman

    got = events_spearman(SF)
    ev = _tbl("events")
    v = np.round(ev["value"] * 100).astype("int64")
    k = ev["props"].str.extract(r'"k":\s*(\d+)')[0].fillna("0").astype("int64")
    rv = pd.Series(v).rank(method="average").to_numpy()
    rk = pd.Series(k).rank(method="average").to_numpy()
    exp = np.corrcoef(rv, rk)[0, 1]
    assert got["n"].iloc[0] == len(ev)
    assert abs(got["spearman"].iloc[0] - exp) < 1e-12


def test_events_type_islands(ray_session):
    from ocr_ray.pipelines.streaming import type_islands

    got = type_islands(SF)
    ev = _tbl("events").sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        seq = 0
        prev = None
        for _, r in g.iterrows():
            if r["event_type"] != prev:
                seq += 1
                rows.append({"user_id": uid, "island_seq": seq,
                             "event_type": r["event_type"], "n_events": 0,
                             "ts_from": r["ts"], "ts_to": r["ts"]})
                prev = r["event_type"]
            rows[-1]["n_events"] += 1
            rows[-1]["ts_to"] = r["ts"]
    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # islands reconstruct the event count exactly
    assert got["n_events"].sum() == len(ev)


def test_q15_top_supplier(ray_session):
    from ocr_ray.pipelines.joins import Q15_FROM, Q15_TO, q15_top_supplier

    got = q15_top_supplier(SF)
    li, supp = _tbl("lineitem"), _tbl("supplier")
    li = li[(li["l_shipdate"] >= Q15_FROM) & (li["l_shipdate"] < Q15_TO)]
    rev_c4 = _cents_s(li["l_extendedprice"]) * (100 - _cents_s(li["l_discount"]))
    g = pd.DataFrame({"sk": li["l_suppkey"], "r": rev_c4}).groupby(
        "sk", as_index=False
    )["r"].sum()
    top = g[g["r"] == g["r"].max()]
    exp = pd.DataFrame(
        {"s_suppkey": top["sk"].astype(np.int64),
         "s_name": top["sk"].map(
             dict(zip(supp["s_suppkey"], supp["s_name"]))),
         "total_revenue": top["r"] / 10000.0}
    ).sort_values("s_suppkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_trend(ray_session):
    from ocr_ray.pipelines.relational import events_trend

    got = events_trend(SF)
    ev = _tbl("events")
    x = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
    y = _cents_s(ev["value"])
    for _, r in got.iterrows():
        m = (ev["event_type"] == r["event_type"]).to_numpy()
        xs, ys = x[m], y[m]
        n = len(xs)
        slope = np.polyfit(xs.astype(float), ys.astype(float), 1)[0]
        assert r["n"] == n
        assert abs(r["slope_c"] - slope) < 1e-6 * max(1, abs(slope))
        # intercept consistent with slope through the mean point
        assert abs(
            r["intercept_c"] - (ys.mean() - r["slope_c"] * xs.mean())
        ) < 1e-6


def test_events_window_join(ray_session):
    """Range-join parity vs brute-force nested loop, plus cross-block
    stability (the merge-rank must not depend on block layout)."""
    from ocr_ray.pipelines.streaming import window_agg_join

    got = window_agg_join(SF)
    ev = _tbl("events")
    p = ev[ev["event_type"] == "purchase"]
    c = ev[ev["event_type"] == "click"]
    cen = _cents_s(c["value"])
    for _, r in p.sample(40, random_state=1).iterrows():
        m = (
            (c["user_id"] == r["user_id"])
            & (c["ts"] >= r["ts"] - pd.Timedelta(hours=24))
            & (c["ts"] < r["ts"])
        ).to_numpy()
        row = got[got["event_id"] == r["event_id"]].iloc[0]
        assert row["n_clicks_24h"] == m.sum()
        assert row["click_value_sum"] == cen[m].sum() / 100.0
    assert len(got) == len(p)


def test_events_daily_dense(ray_session):
    from ocr_ray.pipelines.relational import events_daily_dense

    got = events_daily_dense(SF)
    ev = _tbl("events")
    days = pd.date_range(ev["ts"].dt.floor("D").min(),
                         ev["ts"].dt.floor("D").max(), freq="D")
    types = sorted(ev["event_type"].unique())
    assert len(got) == len(days) * len(types)  # full grid, no gaps
    agg = (
        pd.DataFrame({"day": ev["ts"].dt.strftime("%Y-%m-%d"),
                      "event_type": ev["event_type"],
                      "c": _cents_s(ev["value"])})
        .groupby(["day", "event_type"], as_index=False)
        .agg(n=("c", "size"), c=("c", "sum"))
    )
    m = got.merge(agg, on=["day", "event_type"], how="left")
    filled = m["n_y"].isna()
    assert (m.loc[filled, "n_x"] == 0).all()
    assert (m.loc[~filled, "n_x"] == m.loc[~filled, "n_y"]).all()
    assert np.allclose(m.loc[~filled, "sum_value"],
                       m.loc[~filled, "c"] / 100.0)
    assert got["n"].sum() == len(ev)


def test_catalog_stats_and_fk_audit(ray_session):
    from ocr_ray.pipelines.relational import catalog_stats, fk_integrity_audit

    cat = catalog_stats(SF)
    assert len(cat) == 10
    ev = _tbl("events")
    row = cat[cat["table_name"] == "events"].iloc[0]
    assert row["n_rows"] == len(ev) and row["n_cols"] == ev.shape[1]

    audit = fk_integrity_audit(SF)
    assert len(audit) == 7
    # the synthetic corpus is referentially clean
    assert (audit["n_orphans"] == 0).all()
    # sanity: a constraint against a PRUNED parent set must find orphans
    orders = _tbl("orders")
    cust = _tbl("customer")
    half = set(cust["c_custkey"][: len(cust) // 2])
    assert (~orders["o_custkey"].isin(half)).sum() > 0


def test_events_winsorized_stats(ray_session):
    from ocr_ray.functions.sketch import HDR_SUB_BITS
    from ocr_ray.pipelines.relational import events_winsorized_stats

    got = events_winsorized_stats(SF)
    ev = _tbl("events")
    cen = _cents_s(ev["value"])
    for _, r in got.iterrows():
        m = (ev["event_type"] == r["event_type"]).to_numpy()
        v = cen[m]
        assert r["n"] == m.sum()
        # thresholds within the sketch's error band of the true quantiles
        tol = 2.0 ** -(HDR_SUB_BITS + 1)
        p1 = np.sort(v)[int(np.ceil(0.01 * len(v))) - 1]
        p99 = np.sort(v)[int(np.ceil(0.99 * len(v))) - 1]
        assert abs(r["lo_c"] - p1) <= tol * p1 + 1
        assert abs(r["hi_c"] - p99) <= tol * p99 + 1
        w = np.clip(v, r["lo_c"], r["hi_c"]).astype(np.int64)
        assert abs(r["mean_w"] - w.mean() / 100.0) < 1e-9
        assert abs(r["var_w"] - w.var(ddof=1) / 10000.0) < 1e-6


def test_revenue_pareto(ray_session):
    from ocr_ray.pipelines.relational import revenue_pareto

    got = revenue_pareto(SF)
    orders = _tbl("orders")
    rev = (
        pd.DataFrame({"c": orders["o_custkey"],
                      "r": _cents_s(orders["o_totalprice"])})
        .groupby("c", as_index=False)["r"].sum()
        .sort_values(["r", "c"], ascending=[False, True])
    )
    total = int(rev["r"].sum())
    thresh = (4 * total + 4) // 5
    cum = np.cumsum(rev["r"].to_numpy())
    n_top = int(np.searchsorted(cum, thresh, side="left")) + 1
    row = got.iloc[0]
    assert row["n_top_customers"] == n_top
    assert row["n_customers"] == len(rev)
    assert row["customer_share"] == n_top / len(rev)
    assert row["revenue_share"] == float(cum[n_top - 1]) / float(total)
    # crossing is genuine: one fewer customer falls short of 80%
    assert cum[n_top - 2] < thresh <= cum[n_top - 1]


def test_orders_open_per_day(ray_session):
    from ocr_ray.pipelines.relational import orders_open_per_day

    got = orders_open_per_day(SF)
    orders, li = _tbl("orders"), _tbl("lineitem")
    ship = li.groupby("l_orderkey")["l_shipdate"].max()
    iv = pd.DataFrame(
        {"s": orders["o_orderdate"].dt.floor("D"),
         "e": orders["o_orderkey"].map(ship).dt.floor("D")}
    )
    iv["e"] = np.maximum(iv["e"], iv["s"])  # clamped like the engine
    # brute force: count intervals covering a sample of the delta days
    days = pd.to_datetime(got["day"])
    for i in np.linspace(0, len(got) - 1, 25, dtype=int):
        day = days.iloc[i]
        exp = ((iv["s"] <= day) & (day <= iv["e"])).sum()
        assert got["n_open"].iloc[i] == exp, (day, exp)
    # counts return to zero after the horizon and never go negative
    assert got["n_open"].iloc[-1] == 0
    assert (got["n_open"] >= 0).all()


def test_events_click_conversion(ray_session):
    from ocr_ray.pipelines.streaming import click_conversion

    got = click_conversion(SF)
    ev = _tbl("events")
    c = ev[ev["event_type"] == "click"]
    p = ev[ev["event_type"] == "purchase"]
    conv = []
    for _, r in c.iterrows():
        conv.append(
            ((p["user_id"] == r["user_id"])
             & (p["ts"] > r["ts"])
             & (p["ts"] <= r["ts"] + pd.Timedelta(hours=24))).any()
        )
    exp = (
        pd.DataFrame({"hour": c["ts"].dt.hour.to_numpy(),
                      "conv": np.array(conv, dtype=np.int64)})
        .groupby("hour", as_index=False)
        .agg(n_clicks=("conv", "size"), n_converted=("conv", "sum"))
    )
    m = got.merge(exp, on="hour", suffixes=("", "_e"))
    assert len(m) == len(got) == len(exp)
    assert (m["n_clicks"] == m["n_clicks_e"]).all()
    assert (m["n_converted"] == m["n_converted_e"]).all()


def test_events_user_p90(ray_session):
    from ocr_ray.functions.sketch import HDR_SUB_BITS
    from ocr_ray.pipelines.streaming import user_value_p90

    got = user_value_p90(SF)
    ev = _tbl("events")
    cen = _cents_s(ev["value"])
    tol = 2.0 ** -(HDR_SUB_BITS + 1)
    assert len(got) == ev["user_id"].nunique()
    for _, r in got.sample(min(30, len(got)), random_state=4).iterrows():
        m = (ev["user_id"] == r["user_id"]).to_numpy()
        v = np.sort(cen[m])
        assert r["n_events"] == m.sum()
        exact = v[(9 * len(v) + 9) // 10 - 1] / 100.0
        assert abs(r["p90"] - exact) <= tol * exact + 1e-9


def test_q4_late_shipments(ray_session):
    from ocr_ray.pipelines.joins import (Q4_FROM, Q4_LATE_DAYS, Q4_TO,
                                         q4_late_shipments)

    got = q4_late_shipments(SF)
    orders, li = _tbl("orders"), _tbl("lineitem")
    ship = li.groupby("l_orderkey")["l_shipdate"].max()
    o = orders[(orders["o_orderdate"] >= Q4_FROM)
               & (orders["o_orderdate"] < Q4_TO)].copy()
    o["ship_end"] = o["o_orderkey"].map(ship)
    late = o[o["ship_end"]
             > o["o_orderdate"] + pd.Timedelta(days=Q4_LATE_DAYS)]
    exp = (
        late.groupby("o_orderpriority", as_index=False).size()
        .rename(columns={"size": "n_late"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_q13_and_q17(ray_session):
    from ocr_ray.pipelines.joins import (q13_order_count_distribution,
                                         q17_small_quantity_revenue)

    q13 = q13_order_count_distribution(SF)
    orders, cust = _tbl("orders"), _tbl("customer")
    pc = orders.groupby("o_custkey").size()
    counts = cust["c_custkey"].map(pc).fillna(0).astype(np.int64)
    exp = counts.value_counts()
    assert q13["n_cust"].sum() == len(cust)
    for _, r in q13.iterrows():
        assert exp.get(r["c_count"], 0) == r["n_cust"]

    q17 = q17_small_quantity_revenue(SF)
    li = _tbl("lineitem")
    g = li.groupby("l_partkey")["l_quantity"].agg(["sum", "count"])
    s = li["l_partkey"].map(g["sum"]).to_numpy()
    n = li["l_partkey"].map(g["count"]).to_numpy()
    keep = li["l_quantity"].to_numpy(np.int64) * 5 * n < s
    rev_c = int(_cents_s(li["l_extendedprice"])[keep].sum())
    assert q17["n_items"].iloc[0] == keep.sum()
    assert q17["avg_yearly"].iloc[0] == rev_c / 7.0 / 100.0


def test_q8_market_share(ray_session):
    from ocr_ray.pipelines.joins import (Q8_NATION, Q8_REGION, Q8_TYPE,
                                         q8_market_share)

    got = q8_market_share(SF)
    li, orders = _tbl("lineitem"), _tbl("orders")
    part, supp = _tbl("part"), _tbl("supplier")
    cust, nat, reg = _tbl("customer"), _tbl("nation"), _tbl("region")
    rk = set(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"])
    region_nk = set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"])
    target_nk = set(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"])
    df = li[li["l_partkey"].isin(
        set(part.loc[part["p_type"] == Q8_TYPE, "p_partkey"])
    )].merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    df = df[df["o_custkey"].map(
        dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    ).isin(region_nk)]
    rev = _cents_s(df["l_extendedprice"]) * (100 - _cents_s(df["l_discount"]))
    is_t = df["l_suppkey"].map(
        dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    ).isin(target_nk).to_numpy()
    year = df["o_orderdate"].dt.year.to_numpy()
    for _, r in got.iterrows():
        m = year == r["o_year"]
        assert r["mkt_share"] == float(rev[m & is_t].sum()) / float(
            rev[m].sum()
        )


def test_null_profile(ray_session):
    from ocr_ray.pipelines.relational import PROFILE_TABLES, null_profile

    got = null_profile(SF)
    for tbl in PROFILE_TABLES:
        df = _tbl(tbl)
        sub = got[got["table_name"] == tbl]
        assert set(sub["column_name"]) == set(df.columns)
        for _, r in sub.iterrows():
            assert r["n_rows"] == len(df)
            assert r["n_nulls"] == df[r["column_name"]].isna().sum()


def test_profile_parquet_nulls_and_types(ray_session, tmp_path):
    """Profiler: exact n/n_null/n_distinct per column, numeric views for
    timestamp (epoch us) and string (utf8 length), invariant to row-group
    layout."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.functions.profile import profile_parquet

    df = pd.DataFrame({
        "i": pd.array([1, 2, 2, None, 5], dtype="Int64"),
        "s": ["a", "bb", None, "bb", ""],
        "d": [1.5, -2.0, 1.5, 0.0, 3.25],
        "t": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-02", "2024-01-03", None]
        ),
    })
    p = tmp_path / "t.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p,
                   row_group_size=2)

    got = profile_parquet(str(p)).set_index("col")
    assert got.loc["i", "n"] == 5 and got.loc["i", "n_null"] == 1
    assert got.loc["i", "n_distinct"] == 3
    assert got.loc["i", "min_num"] == 1.0 and got.loc["i", "max_num"] == 5.0
    assert got.loc["s", "n_null"] == 1 and got.loc["s", "n_distinct"] == 3
    assert got.loc["s", "min_num"] == 0.0 and got.loc["s", "max_num"] == 2.0
    assert got.loc["d", "n_distinct"] == 4
    assert got.loc["d", "min_num"] == -2.0 and got.loc["d", "max_num"] == 3.25
    assert got.loc["t", "n_null"] == 1 and got.loc["t", "n_distinct"] == 3
    # epoch micros
    assert got.loc["t", "min_num"] == pd.Timestamp("2024-01-01").value / 1000
    assert (got[["n", "n_null", "n_distinct"]].dtypes == "int64").all()


def test_profile_parquet_empty_table(ray_session, tmp_path):
    """A 0-row table (zero read blocks) profiles as all-zero counts with
    empty NaN ranges instead of crashing on a column-less frame."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.functions.profile import profile_parquet

    t = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.string())})
    p = tmp_path / "empty.parquet"
    pq.write_table(t, p)
    got = profile_parquet(str(p))
    assert list(got["col"]) == ["a", "b"]
    assert (got[["n", "n_null", "n_distinct"]] == 0).all().all()
    assert got["min_num"].isna().all() and got["max_num"].isna().all()
    assert (got[["n", "n_null", "n_distinct"]].dtypes == "int64").all()


# --- association rules -----------------------------------------------------


def test_assoc_rules_matches_brute(ray_session, tmp_path):
    import itertools

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import events_assoc_rules

    rng = np.random.RandomState(61)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 40, size=n).astype(np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, size=n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "d"], size=n),
        "value": np.round(rng.uniform(0, 100, size=n), 2),
        "props": ["{}"] * n,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = events_assoc_rules(str(tmp_path))

    baskets = df.groupby("user_id")["event_type"].agg(set)
    nn = len(baskets)
    na = {}
    for s in baskets:
        for t in s:
            na[t] = na.get(t, 0) + 1
    exp = []
    types = sorted(na)
    for a, b in itertools.permutations(types, 2):
        nb = sum(1 for s in baskets if a in s and b in s)
        if nb == 0:
            continue

        def r6(x):
            return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)

        exp.append((a, b, nb, na[a], na[b], r6(nb / nn), r6(nb / na[a]),
                    r6(nb * float(nn) / float(na[a] * na[b]))))
    expdf = pd.DataFrame(
        exp, columns=["ante", "cons", "n_both", "n_ante", "n_cons",
                      "support", "confidence", "lift"]
    ).astype({"n_both": "int64", "n_ante": "int64", "n_cons": "int64"})
    pd.testing.assert_frame_equal(out, expdf)
