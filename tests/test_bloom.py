"""Bloom filter and kmeans operator tests."""

import numpy as np


def test_bloom_no_false_negatives():
    from ocr_ray.functions.bloom import BloomFilter

    rng = np.random.RandomState(0)
    members = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    bf = BloomFilter(capacity=5000, fp_rate=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever


def test_bloom_fp_rate_bounded():
    from ocr_ray.functions.bloom import BloomFilter

    rng = np.random.RandomState(1)
    members = np.arange(5000, dtype=np.int64)
    bf = BloomFilter(capacity=5000, fp_rate=0.01)
    bf.add(members)
    probes = np.arange(1_000_000, 1_050_000, dtype=np.int64)  # disjoint
    fp = bf.contains(probes).mean()
    assert fp < 0.03  # ~1% design rate with slack


def test_bloom_deterministic_across_instances():
    from ocr_ray.functions.bloom import BloomFilter

    a = BloomFilter(capacity=100, fp_rate=0.01)
    b = BloomFilter(capacity=100, fp_rate=0.01)
    vals = np.arange(100, dtype=np.int64)
    a.add(vals)
    b.add(vals)
    assert np.array_equal(a.bits, b.bits)


def test_kmeans_assign(ray_session):
    import ray.data as rd

    from ocr_ray.functions.similarity import kmeans_assign

    embs = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    out = kmeans_assign(embs, n_centroids=10).to_pandas()
    assert len(out) == 500
    assert out["cluster"].nunique() >= 5  # spreads across centroids
    out2 = kmeans_assign(embs, n_centroids=10).to_pandas()
    assert out.sort_values("vec_id").cluster.tolist() == out2.sort_values("vec_id").cluster.tolist()
