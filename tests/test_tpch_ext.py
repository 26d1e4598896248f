"""Derived-relation TPC-H kernels (tpch_ext): formula determinism and
an in-bucket Q21 winners replay. End-to-end value parity vs DuckDB runs
through tools/check_queries.py (all 8 oracle-exact at sf0.001/sf0.01)."""

import numpy as np
import pandas as pd

from ocr_ray.pipelines.tpch_ext import (
    CONTAINERS,
    MODES,
    _commit_receipt,
    _ps_availqty,
    _ps_cost_c,
    _ps_offsets,
    _shipmode_idx,
)


def test_ps_offsets_distinct():
    # 4 distinct suppliers per part at every corpus supplier count
    for s in (10, 100, 1000, 13):
        off = _ps_offsets(s)
        assert len(off) == 4 and len(set(off.tolist())) == 4


def test_derived_value_ranges():
    pk = np.arange(0, 5000, dtype=np.int64)
    sk = (pk * 3 + 1) % 100
    aq, cc = _ps_availqty(pk, sk), _ps_cost_c(pk, sk)
    assert aq.min() >= 1 and aq.max() <= 9999
    assert cc.min() >= 10000 and cc.max() < 100000  # $100.00..$999.99
    assert len(MODES) == 7 and len(CONTAINERS) == 8
    assert set(_shipmode_idx(pk, sk % 7 + 1).tolist()) <= set(range(7))


def test_commit_receipt_windows():
    ship = pd.Series(pd.to_datetime(["1997-06-01"] * 4).astype("datetime64[us]"))
    ok = np.array([1, 2, 3, 4], dtype=np.int64)
    ln = np.array([1, 1, 2, 3], dtype=np.int64)
    commit, receipt = _commit_receipt(ship, ok, ln)
    dc = (commit - ship).dt.days
    dr = (receipt - ship).dt.days
    assert ((dc >= -30) & (dc <= 30)).all()
    assert ((dr >= 1) & (dr <= 30)).all()
    # determinism
    c2, r2 = _commit_receipt(ship, ok, ln)
    assert (commit == c2).all() and (receipt == r2).all()


def test_q21_winners_replay():
    """In-bucket sole-late-supplier logic == a row-by-row replay."""
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {"l_orderkey": rng.randint(0, 40, 400),
         "l_suppkey": rng.randint(0, 8, 400),
         "late": rng.rand(400) < 0.3}
    )
    # expected: per order, >1 distinct suppliers and exactly 1 late one
    exp: dict[int, int] = {}
    for ok_, g in df.groupby("l_orderkey"):
        late_supps = set(g.loc[g["late"], "l_suppkey"])
        if g["l_suppkey"].nunique() > 1 and len(late_supps) == 1:
            s = late_supps.pop()
            exp[s] = exp.get(s, 0) + 1

    pairs = df[["l_orderkey", "l_suppkey"]].drop_duplicates()
    ns = pairs.groupby("l_orderkey")["l_suppkey"].size()
    late = df.loc[df["late"], ["l_orderkey", "l_suppkey"]].drop_duplicates()
    nl = late.groupby("l_orderkey")["l_suppkey"].size()
    ok = ns.index[ns > 1].intersection(nl.index[nl == 1])
    win = late[late["l_orderkey"].isin(ok)]
    got = win.groupby("l_suppkey")["l_orderkey"].size().to_dict()
    assert got == exp and exp  # non-vacuous


def test_no_direct_from_pandas_producers():
    """Convention guard (schema-hash regression): every pandas->Arrow
    producer must go through partial_agg.from_pandas, which strips the
    unhashable b'pandas' schema metadata. A direct pa.Table.from_pandas
    call silently re-breaks Ray's block-schema dedup — and the pqread
    logging filter would hide the warning."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "ocr_ray")
    offenders = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, root)
            if rel == os.path.join("stages", "partial_agg.py"):
                continue  # the one sanctioned wrapper
            src = open(path).read()
            if re.search(r"pa\.Table\.from_pandas|pyarrow\.Table\.from_pandas", src):
                offenders.append(rel)
    assert not offenders, (
        f"direct pa.Table.from_pandas in {offenders}; use "
        "ocr_ray.stages.partial_agg.from_pandas instead"
    )


def test_q19_above_gate_join_path(ray_session, monkeypatch):
    """Force q19's partitioned-join path (broadcast gate at 0) and pin it
    to the broadcast path's output — both strategies must produce the
    identical revenue scalar."""
    from ocr_ray.pipelines import joins
    from ocr_ray.pipelines.tpch_ext import q19_discounted_revenue

    sf = "/root/testdata/sf0.001"
    fast = q19_discounted_revenue(sf)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    slow = q19_discounted_revenue(sf)
    pd.testing.assert_frame_equal(fast, slow)


def test_q2_q11_above_gate_join_path(ray_session, monkeypatch):
    """Region-supplier membership + attribute attach forced onto the
    partitioned path must reproduce the broadcast path bit-for-bit."""
    from ocr_ray.pipelines import joins
    from ocr_ray.pipelines.tpch_ext import q2_min_cost_supplier, q11_important_stock

    sf = "/root/testdata/sf0.001"
    fast2 = q2_min_cost_supplier(sf)
    fast11 = q11_important_stock(sf)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    pd.testing.assert_frame_equal(fast2, q2_min_cost_supplier(sf))
    pd.testing.assert_frame_equal(fast11, q11_important_stock(sf))


def test_q16_q20_q21_above_gate_join_path(ray_session, monkeypatch):
    from ocr_ray.pipelines import joins
    from ocr_ray.pipelines.tpch_ext import (
        q16_supplier_cnt, q20_potential_promotion, q21_waiting_suppliers)

    sf = "/root/testdata/sf0.001"
    fast16 = q16_supplier_cnt(sf)
    fast20 = q20_potential_promotion(sf)
    fast21 = q21_waiting_suppliers(sf)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    pd.testing.assert_frame_equal(fast16, q16_supplier_cnt(sf))
    pd.testing.assert_frame_equal(fast20, q20_potential_promotion(sf))
    pd.testing.assert_frame_equal(fast21, q21_waiting_suppliers(sf))
