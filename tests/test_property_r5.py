"""Property-based tests for the fifth-session kernels (pure functions
only — no Ray session needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 500), st.integers(1, 7))
def test_ntile_partition_properties(n_g, k):
    """NTILE(k) over n rows: buckets are 1..min(k, n), sizes differ by
    at most 1, earlier buckets never smaller, ranks map monotonically."""
    from ocr_ray.functions.textstats import _ntile_of

    if n_g == 0:
        return
    b = _ntile_of(np.arange(n_g), n_g, k)
    assert b.min() == 1 and b.max() == min(k, n_g)
    sizes = np.bincount(b)[1:]
    sizes = sizes[sizes > 0]
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes) <= 0).all()  # earlier buckets >= later
    assert (np.diff(b) >= 0).all()      # monotone in rank


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=0, max_size=60,
                unique=True),
       st.integers(2, 8))
def test_snm_window_pairs_properties(ids, w):
    """Exactly the (i, j) pairs with 0 < j - i < w, each canonical and
    emitted once."""
    from ocr_ray.functions.dedup import _snm_window_pairs

    arr = np.array(ids, dtype=np.int64)
    a, b = _snm_window_pairs(arr, w)
    got = sorted(zip(a.tolist(), b.tolist()))
    exp = sorted(
        (min(int(arr[i]), int(arr[j])), max(int(arr[i]), int(arr[j])))
        for i in range(len(arr)) for j in range(i + 1, min(i + w, len(arr)))
    )
    assert got == exp
    assert all(x < y for x, y in got)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=50))
def test_half_away_rounding_matches_duckdb(vals):
    """The engine's half-away 4-dp formula == DuckDB round(x, 4) on
    arbitrary doubles (the events_ewma emission contract)."""
    import duckdb

    x = np.array(vals, dtype=np.float64)
    eng = np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4
    con = duckdb.connect()
    for v, e in zip(x, eng):
        got = con.execute("SELECT round(CAST(? AS DOUBLE), 4)", [float(v)]
                          ).fetchone()[0]
        assert got == e, (v, got, e)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from("ab cd ef gh ij kl mn".split()),
                min_size=0, max_size=120),
       st.integers(2, 16))
def test_cdc_chunks_tile_property(tokens, modulus):
    """CDC chunks tile the doc exactly: contiguous, 1-based, disjoint,
    covering, and every internal boundary token hashes to 0 mod m."""
    import pandas as pd
    import pyarrow as pa

    from ocr_ray.functions.packing import cdc_chunks
    from ocr_ray.functions.textstats import hash_token

    import ray.data as rd

    text = " ".join(tokens)
    out = cdc_chunks(
        rd.from_arrow(pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array([text], pa.string()),
        })), modulus=modulus,
    ).to_pandas()
    if not tokens:
        # Ray 2.49 returns a column-less frame for an all-empty Dataset
        assert len(out) == 0
        return
    out = out.sort_values("chunk_idx")
    assert out["start_tok"].iloc[0] == 1
    assert out["end_tok"].iloc[-1] == len(tokens)
    assert (out["start_tok"].to_numpy()[1:]
            == out["end_tok"].to_numpy()[:-1] + 1).all()
    assert (out["n_tokens"] == out["end_tok"] - out["start_tok"] + 1).all()
    for e in out["end_tok"].to_numpy()[:-1]:
        assert hash_token(tokens[e - 1]) % modulus == 0
