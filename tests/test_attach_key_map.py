"""attach_key_map (the adaptive fact->dimension hop) — unit parity of
the broadcast-searchsorted and partitioned-bucket-join strategies, plus
forced-gate parity for every query routed through it (q5/q7/q8/q9/q17).

The round-3/4 lesson this seam encodes: supplier/customer/part are
corpus-scaled tables, so a ray.put of a full key->value dict is an
unbounded driver-side structure; attach_key_map keeps the dimension a
Dataset above _BROADCAST_KEY_LIMIT."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _mk(ray_session):
    import ray.data as rd

    facts = rd.from_pandas(
        pd.DataFrame(
            {"k": np.array([1, 2, 3, 5, 2, 9], dtype=np.int64),
             "x": np.arange(6, dtype=np.int64)}
        )
    )
    dim = rd.from_pandas(
        pd.DataFrame(
            {"k": np.array([1, 2, 3, 4], dtype=np.int64),
             "v": np.array([10, 20, 30, 40], dtype=np.int64),
             "w": np.array([-1, -2, -3, -4], dtype=np.int64)}
        )
    )
    return facts, dim


def _expect():
    # inner semantics: k=5 and k=9 rows dropped
    return pd.DataFrame(
        {"k": np.array([1, 2, 2, 3], dtype=np.int64),
         "x": np.array([0, 1, 4, 2], dtype=np.int64),
         "v": np.array([10, 20, 20, 30], dtype=np.int64),
         "w": np.array([-1, -2, -2, -3], dtype=np.int64)}
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["k", "x", "v", "w"]]
        .astype(np.int64)
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )


def test_attach_key_map_broadcast_path(ray_session):
    from ocr_ray.pipelines.joins import attach_key_map

    facts, dim = _mk(ray_session)
    out = attach_key_map(facts, dim, on="k", value_cols=["v", "w"]).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), _expect())


def test_attach_key_map_join_path(ray_session, monkeypatch):
    from ocr_ray.pipelines import joins

    facts, dim = _mk(ray_session)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    out = joins.attach_key_map(
        facts, dim, on="k", value_cols=["v", "w"],
        facts_dtypes={"k": np.int64, "x": np.int64},
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), _expect())


def test_attach_key_map_empty_dim(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.joins import attach_key_map

    facts, dim = _mk(ray_session)
    empty = dim.filter(lambda r: False)
    out = attach_key_map(facts, empty, on="k", value_cols=["v", "w"]).to_pandas()
    assert len(out) == 0
    assert rd is not None


def test_q5_q7_above_gate_join_path(ray_session, monkeypatch):
    """Both nationkey hops forced onto the partitioned path must
    reproduce the broadcast path bit-for-bit."""
    from ocr_ray.pipelines import joins

    fast5 = joins.q5_local_supplier_volume(SF)
    fast7 = joins.q7_nation_flows(SF)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    pd.testing.assert_frame_equal(fast5, joins.q5_local_supplier_volume(SF))
    pd.testing.assert_frame_equal(fast7, joins.q7_nation_flows(SF))


def test_q8_q17_above_gate_join_path(ray_session, monkeypatch):
    from ocr_ray.pipelines import joins

    fast8 = joins.q8_market_share(SF)
    fast17 = joins.q17_small_quantity_revenue(SF)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    pd.testing.assert_frame_equal(fast8, joins.q8_market_share(SF))
    pd.testing.assert_frame_equal(fast17, joins.q17_small_quantity_revenue(SF))


def test_q9_above_gate_join_path(ray_session, monkeypatch):
    from ocr_ray.pipelines import joins
    from ocr_ray.pipelines.tpch_ext import q9_product_profit

    fast = q9_product_profit(SF)
    monkeypatch.setattr(joins, "_BROADCAST_KEY_LIMIT", 0)
    pd.testing.assert_frame_equal(fast, q9_product_profit(SF))
