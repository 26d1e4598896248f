"""End-to-end corpus curation — the north-star training-data DAG composed
from the engine's own operators, each stage the scale shape it would keep
at 100 TB:

    read documents (pruned)
      -> quality gate              (vectorized features, fixed thresholds)
      -> exact dedup               (canonical-text groupby, keep min doc_id;
                                    keeper set joined back Dataset-side)
      -> near-dup keep-list        (MinHash-LSH pairs -> connected
                                    components -> keep min of cluster)
      -> train/val/test split      (deterministic hash assignment)

Every stage is individually SQL-verified elsewhere; the composed pipeline
carries its own end-to-end DuckDB twin (``docs_curated``), so the whole
DAG — not just its pieces — is driver-checkable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min

__all__ = ["curate_documents"]


def curate_documents(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """Returns the curated corpus manifest as a STREAMING Dataset of
    (doc_id, split) — at 100 TB the manifest is itself corpus-sized, so it
    must flow to a sink, never to the driver."""
    from ..functions.dedup import add_content_hash, dedup_keep_list
    from ..functions.sampling import stratified_split
    from ..functions.textstats import quality_batch
    from .joins import cogroup_bucket_join

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    # 1. quality gate — features computed per batch, rows filtered in place
    #    (text kept: downstream dedup needs it)
    def gate(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(q["n_tokens"], 10),
                pc.less_equal(q["stop_ratio"], 0.5),
            ),
            pc.greater_equal(q["mean_token_len"], 2.0),
        )
        return t.filter(mask)

    survivors = docs.map_batches(gate, batch_format="pyarrow")

    # 2. exact dedup: min doc_id per canonical text; keeper ids joined back
    #    Dataset-side (no driver key set)
    hashed = survivors.map_batches(add_content_hash, batch_format="pyarrow")
    keepers = (
        hashed.groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    exact_survivors = cogroup_bucket_join(
        survivors, keepers, "doc_id", n_buckets=32
    ).materialize()

    # 3. near-dup keep-list (MinHash-LSH -> components -> keep min); drops
    #    are bounded by near-dup cluster membership
    kl = dedup_keep_list(exact_survivors, threshold=threshold)
    drops = (
        np.sort(kl.loc[~kl["keep"], "doc_id"].to_numpy(dtype=np.int64))
        if len(kl)
        else np.array([], dtype=np.int64)
    )
    dref = ray.put(drops)

    def drop_neardups(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, ray.get(dref))
        return t.filter(pa.array(keep)).select(["doc_id"])

    final = exact_survivors.map_batches(drop_neardups, batch_format="pyarrow")

    # 4. deterministic split assignment — stays a Dataset (stream to sink)
    return stratified_split(final, "doc_id")
