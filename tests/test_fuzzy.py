"""Edit-distance join tests: banded DP vs full DP, planted-edit corpus
vs brute force, partition invariance."""

import numpy as np
import pandas as pd
import pytest


def _full_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[lb]


def test_banded_levenshtein_matches_full_dp():
    from ocr_ray.functions.fuzzy import banded_levenshtein

    rng = np.random.RandomState(11)
    alpha = "abcd"
    for _ in range(300):
        a = "".join(rng.choice(list(alpha), size=rng.randint(0, 12)))
        b = "".join(rng.choice(list(alpha), size=rng.randint(0, 12)))
        for k in (0, 1, 2, 3):
            true = _full_levenshtein(a, b)
            got = banded_levenshtein(a, b, k)
            if true <= k:
                assert got == true, (a, b, k)
            else:
                assert got == k + 1, (a, b, k)


def test_banded_levenshtein_unicode():
    from ocr_ray.functions.fuzzy import banded_levenshtein

    assert banded_levenshtein("café", "cafe", 2) == 1
    assert banded_levenshtein("日本語", "日語", 2) == 1


def test_edit_distance_join_brute_force(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from ocr_ray.functions.fuzzy import edit_distance_join

    rng = np.random.RandomState(5)
    alpha = list("abcdef")
    base = ["".join(rng.choice(alpha, size=rng.randint(8, 20)))
            for _ in range(60)]
    left = pd.DataFrame({"doc_id": np.arange(60), "s": base})
    # probes: exact copies, single edits (sub/del/ins), double edits,
    # and unrelated strings
    probes = []
    for i, s in enumerate(base[:30]):
        if i % 5 == 0:
            probes.append(s)
        elif i % 5 == 1:
            probes.append("z" + s[1:])             # substitution
        elif i % 5 == 2:
            probes.append(s[1:])                   # deletion
        elif i % 5 == 3:
            probes.append("z" + s)                 # insertion
        else:
            probes.append("zz" + s[2:])            # two substitutions
    probes += ["".join(rng.choice(alpha, size=15)) for _ in range(20)]
    right = pd.DataFrame({"vid": np.arange(len(probes)), "s": probes})

    k = 2
    got = (edit_distance_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(7),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(5),
        left_id="doc_id", right_id="vid", k=k)
        .to_pandas().sort_values(["doc_id", "vid"]).reset_index(drop=True))

    want_rows = []
    for _, lr in left.iterrows():
        for _, rr in right.iterrows():
            d = _full_levenshtein(lr["s"], rr["s"])
            if d <= k:
                want_rows.append({"doc_id": lr["doc_id"], "vid": rr["vid"],
                                  "dist": d})
    want = (pd.DataFrame(want_rows)
            .sort_values(["doc_id", "vid"]).reset_index(drop=True))
    assert len(want) >= 30  # the planted edits are all found
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_edit_distance_join_empty_sides(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from ocr_ray.functions.fuzzy import edit_distance_join

    left = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "s": pa.array(["hello"], pa.string())})
    right = pa.table({"vid": pa.array([], pa.int64()),
                      "s": pa.array([], pa.string())})
    out = edit_distance_join(rd.from_arrow(left), rd.from_arrow(right),
                             left_id="doc_id", right_id="vid", k=2)
    assert out.count() == 0


def test_fuzzy_variant_join_nonvacuous(ray_session):
    from ocr_ray.functions.fuzzy import fuzzy_variant_join

    out = fuzzy_variant_join("/root/testdata/sf0.001").to_pandas()
    # every doc matches its own variant at dist <= 1, and the corpus'
    # exact-duplicate docs produce cross matches on top
    n_docs = 500
    assert len(out) >= n_docs
    own = out[out["doc_id"] == out["vid"]]
    assert len(own) == n_docs
    assert (own["dist"] <= 1).all()
    assert (out["dist"] <= 2).all()
