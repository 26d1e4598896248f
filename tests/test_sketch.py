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


# ---- HDR-histogram quantile sketch ---------------------------------------


def test_hdr_bucket_error_bound_and_monotone():
    """Every positive int64 decodes back within the guaranteed relative
    error 2^-(SUB_BITS+1), and bucket ids are monotone in the value."""
    import numpy as np

    from ocr_ray.functions.sketch import HDR_SUB_BITS, hdr_bucket, hdr_rep_c

    rng = np.random.default_rng(7)
    v = np.concatenate(
        [
            np.arange(1, 4096),  # exhaustive small range (incl. singletons)
            rng.integers(1, 1 << 40, size=200_000),
            (np.int64(1) << np.arange(0, 60)),  # powers of two (edges)
            (np.int64(1) << np.arange(1, 60)) - 1,  # just below the edges
        ]
    ).astype(np.int64)
    ids = hdr_bucket(v)
    rep = hdr_rep_c(ids)
    rel = np.abs(rep - v) / v
    assert rel.max() <= 2.0 ** -(HDR_SUB_BITS + 1)
    # values < 2^SUB_BITS are singleton buckets: decode is exact
    small = v < (1 << HDR_SUB_BITS)
    assert np.array_equal(rep[small], v[small].astype(float))
    # monotone: sorting values sorts bucket ids
    order = np.argsort(v, kind="mergesort")
    assert np.all(np.diff(ids[order]) >= 0)


def test_hdr_quantiles_merge_invariance_and_accuracy(ray_session):
    """The sketch is mergeable: 1-block and 16-block runs agree exactly,
    and each pick is within the bucket error of the true quantile."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.functions.sketch import HDR_SUB_BITS, hdr_quantiles_by_key

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], size=30_000),
            "v": rng.lognormal(4.0, 1.5, size=30_000),
        }
    )
    df["v_c"] = np.maximum(np.round(df["v"] * 100).astype(np.int64), 1)
    qs = [(1, 2), (9, 10), (99, 100)]

    def run(nblocks):
        ds = rd.from_pandas(df).repartition(nblocks)
        return hdr_quantiles_by_key(
            ds, "k", lambda t: t.column("v_c").to_numpy(), qs
        ).sort_values("k").reset_index(drop=True)

    one, many = run(1), run(16)
    pd.testing.assert_frame_equal(one, many)

    tol = 2.0 ** -(HDR_SUB_BITS + 1)
    for k, g in df.groupby("k"):
        vs = np.sort(g["v_c"].to_numpy())
        row = one[one["k"] == k].iloc[0]
        assert row["n"] == len(vs)
        for (num, den), col in zip(qs, ["p50", "p90", "p99"]):
            r = (num * len(vs) + den - 1) // den
            exact = vs[r - 1] / 100.0
            assert abs(row[col] - exact) <= tol * exact + 1e-9, (k, col)


# ---- KMV bottom-k distinct sketch ----------------------------------------


def test_kmv_merge_invariance_accuracy_and_exact_branch(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.functions.sketch import KMV_K, kmv_distinct_by_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.choice(["big", "small"], 50_000, p=[0.97, 0.03]),
            # 'big' draws from 20k ids (estimator branch); 'small' is
            # capped under KMV_K distinct ids (exact branch)
            "v": rng.integers(0, 20_000, 50_000),
        }
    )
    df.loc[df["k"] == "small", "v"] = df.loc[df["k"] == "small", "v"] % 100

    got1 = kmv_distinct_by_key(rd.from_pandas(df).repartition(1), "k", "v")
    got16 = kmv_distinct_by_key(rd.from_pandas(df).repartition(16), "k", "v")
    pd.testing.assert_frame_equal(got1, got16)  # union+cut merge is exact

    exact = df.groupby("k")["v"].nunique()
    e1 = dict(zip(got1["k"], got1["approx_distinct"]))
    # small group sits below k -> the sketch IS the distinct set
    assert exact["small"] < KMV_K and e1["small"] == exact["small"]
    # big group: ~1/sqrt(k-2) std error, allow 4 sigma
    rel = abs(e1["big"] - exact["big"]) / exact["big"]
    assert rel < 4.0 / np.sqrt(KMV_K - 2), rel


def test_hdr_bucket_sql_parity():
    """The oracle's bucket CTE (powers-of-two join + integer shifts)
    computes EXACTLY hdr_bucket for random and adversarial values."""
    import duckdb
    import numpy as np

    from ocr_ray.functions.sketch import hdr_bucket

    rng = np.random.default_rng(21)
    v = np.unique(np.concatenate([
        rng.integers(1, 1 << 50, 5000),
        np.arange(1, 600),
        (np.int64(1) << np.arange(0, 50)),
        (np.int64(1) << np.arange(1, 50)) - 1,
        (np.int64(1) << np.arange(1, 50)) + 1,
    ]).astype(np.int64))
    con = duckdb.connect()
    con.register("vals_np", __import__("pandas").DataFrame({"v": v}))
    sql = """
        WITH pow2 AS (
          SELECT e, (CAST(1 AS BIGINT) << e) AS p
          FROM generate_series(0, 62) t(e)
        ),
        ve AS (
          SELECT v, max(e) AS e FROM vals_np JOIN pow2 ON p <= v GROUP BY v
        )
        SELECT v, CASE WHEN e < 4 THEN v
                       ELSE ((e - 3) << 4) + ((v >> (e - 4)) - 16)
                  END AS bucket
        FROM ve ORDER BY v
    """
    got = con.execute(sql).df()
    exp = hdr_bucket(got["v"].to_numpy(np.int64))
    assert np.array_equal(got["bucket"].to_numpy(np.int64), exp)


def test_cms_overestimates_and_merge_invariance(ray_session):
    """Count-Min estimates are >= exact counts, exact for values whose
    counters collide with nothing, and invariant to block partitioning
    (counter merge is elementwise sum)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.functions.sketch import cms_point_counts

    rng = np.random.default_rng(7)
    # zipf-ish: a few heavy ids + a long tail, enough distinct values
    # (vs CMS_W=256) that some collisions actually fire
    v = np.concatenate([
        np.repeat([1, 2, 3], [4000, 2000, 1000]),
        rng.integers(10, 2000, 10_000),
    ]).astype(np.int64)
    df = pd.DataFrame({"v": v})

    got1 = cms_point_counts(rd.from_pandas(df).repartition(1), "v")
    got16 = cms_point_counts(rd.from_pandas(df).repartition(16), "v")
    pd.testing.assert_frame_equal(got1, got16)

    exact = df.groupby("v").size()
    est = dict(zip(got1["v"], got1["approx_n"]))
    assert set(est) == set(exact.index)
    overs = 0
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
        overs += est[k] > n
    # heavy hitters: overcount is only colliding tail mass, tiny in
    # relative terms (exactness is not guaranteed — all d rows can collide)
    for k in (1, 2, 3):
        assert est[k] - exact[k] <= 0.05 * exact[k], (k, est[k], exact[k])
    # error bound: eps = 2/w of total mass, prob 1 - 2^-d (loose check)
    total = len(v)
    bad = sum(1 for k, n in exact.items() if est[k] - n > 2 * total / 256)
    assert bad == 0, bad
    # the width was chosen so collisions actually exercise the min-path
    assert overs > 0


def test_kmv_overlap_accuracy_and_partition_invariance(ray_session):
    """The KMV set-operation sketch estimates |A|, |B|, |A u B|, |A n B|
    within theta-sketch error at k=64, is invariant to block
    partitioning, and returns exact figures when both sides fit in k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.functions.sketch import kmv_overlap

    rng = np.random.default_rng(11)
    a = rng.choice(100_000, 3000, replace=False)
    # ~1/3 of B overlaps A
    b = np.concatenate([a[:1000], 200_000 + rng.choice(50_000, 2000, replace=False)])
    df = pd.DataFrame({
        "event_type": ["purchase"] * len(a) + ["error"] * len(b),
        "user_id": np.concatenate([a, b]).astype(np.int64),
    })
    # duplicate rows must not matter (sets, not bags)
    df = pd.concat([df, df.sample(2000, random_state=0)], ignore_index=True)

    got1 = kmv_overlap(rd.from_pandas(df).repartition(1),
                       "event_type", "user_id", "purchase", "error")
    got16 = kmv_overlap(rd.from_pandas(df).repartition(16),
                        "event_type", "user_id", "purchase", "error")
    pd.testing.assert_frame_equal(got1, got16)

    r = got1.iloc[0]
    # k=64 -> RSE ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert abs(r["approx_a"] - 3000) <= 0.51 * 3000
    assert abs(r["approx_b"] - 3000) <= 0.51 * 3000
    assert abs(r["approx_union"] - 5000) <= 0.51 * 5000
    # intersection RSE is higher (small sample of the union); loose bound
    assert 0 <= r["approx_inter"] <= 3 * 1000
    assert r["approx_inter"] >= 100

    # exact branch: both sides below k
    small = pd.DataFrame({
        "event_type": ["purchase"] * 20 + ["error"] * 25,
        "user_id": np.concatenate([np.arange(20), np.arange(10, 35)]).astype(np.int64),
    })
    ex = kmv_overlap(rd.from_pandas(small), "event_type", "user_id",
                     "purchase", "error").iloc[0]
    assert ex["approx_a"] == 20 and ex["approx_b"] == 25
    assert ex["approx_union"] == 35 and ex["approx_inter"] == 10


def test_kmv_overlap_degenerate_sides(ray_session):
    """Missing sides: neither type present (column-less to_pandas frame)
    and one-sided input both fall through to the exact zero branches."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.functions.sketch import kmv_overlap

    none = pd.DataFrame({"event_type": ["view"] * 5,
                         "user_id": np.arange(5, dtype=np.int64)})
    r = kmv_overlap(rd.from_pandas(none), "event_type", "user_id",
                    "purchase", "error").iloc[0]
    assert list(r) == [0, 0, 0, 0]

    one = pd.DataFrame({"event_type": ["purchase"] * 7,
                        "user_id": np.arange(7, dtype=np.int64)})
    r = kmv_overlap(rd.from_pandas(one), "event_type", "user_id",
                    "purchase", "error").iloc[0]
    assert list(r) == [7, 0, 7, 0]
