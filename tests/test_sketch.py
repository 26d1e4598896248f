"""HyperLogLog sketch tests: accuracy bound, mergeability, exact twin."""

import numpy as np
import pytest

from ocr_ray.functions.sketch import HyperLogLog


def test_hll_accuracy():
    rng = np.random.RandomState(0)
    for true_n in [100, 5000, 200_000]:
        vals = np.unique(rng.randint(0, 1 << 62, size=true_n * 2).astype(np.int64))[:true_n]
        h = HyperLogLog()
        h.add(vals)
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05  # p=12 -> ~1.6% sigma


def test_hll_merge_equals_union():
    a_vals = np.arange(0, 10_000, dtype=np.int64)
    b_vals = np.arange(5_000, 15_000, dtype=np.int64)
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    a.add(a_vals)
    b.add(b_vals)
    u.add(np.arange(0, 15_000, dtype=np.int64))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)  # exact register equality


def test_hll_duplicates_dont_inflate():
    h = HyperLogLog()
    for _ in range(5):
        h.add(np.arange(1000, dtype=np.int64))
    assert abs(h.estimate() - 1000) / 1000 < 0.05


def test_distinct_by_key_exact_and_approx(ray_session):
    import ray.data as rd

    from ocr_ray.functions.sketch import exact_distinct_by_key, hll_distinct_by_key

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["event_type", "user_id"])
    exact = exact_distinct_by_key(ds, "event_type", "user_id")
    approx = hll_distinct_by_key(ds, "event_type", "user_id")
    merged = exact.merge(approx, on="event_type")
    assert len(merged) == len(exact)
    for _, r in merged.iterrows():
        assert abs(r.approx_distinct - r.n_distinct) / max(1, r.n_distinct) < 0.05


def test_heavy_hitters_exact_on_zipf(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from ocr_ray.functions.sketch import heavy_hitters, misra_gries_block

    # Zipfian item stream: vocabulary far above the sketch capacity so the
    # per-block prune genuinely discards items
    rng = np.random.RandomState(11)
    items = np.array([f"w{int(i)}" for i in
                      np.clip(rng.zipf(1.3, 60_000), 1, 5000)], dtype=object)
    docs = pd.DataFrame({"text": [" ".join(items[i:i + 200])
                                  for i in range(0, len(items), 200)]})

    def words_of(t):
        out = []
        for txt in t.column("text").to_pylist():
            out.extend(txt.split())
        return np.array(out, dtype=object)

    k = 50
    out = heavy_hitters(rd.from_pandas(docs).repartition(8), k, words_of)

    vals, counts = np.unique(items, return_counts=True)
    total = len(items)
    brute = pd.DataFrame({"term": vals, "n": counts.astype(np.int64)})
    brute = brute[brute["n"] * k > total].sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, brute)
    assert len(out) > 0
    # the per-block prune keeps at most k items
    keep = misra_gries_block(vals, counts, k)
    assert len(keep) <= k
