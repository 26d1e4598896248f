"""Sequence packing — grouping documents into training sequences of at
most ``cap`` tokens (the LLM-training batch-shaping op).

Greedy packing is inherently sequential, so the scale shape is
SHARD-LOCAL determinism: documents are partitioned into contiguous
``doc_id // shard`` ranges (embarrassingly parallel, one group per
shard), and the greedy first-fit-in-order scan runs inside each shard.
Pack assignment is a pure function of (doc_id, token counts) — stable
across reruns, partitionings, and cluster sizes. The SQL twin replays the
scan with a recursive CTE per shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["pack_sequences", "PACK_CAP", "PACK_SHARD"]

PACK_CAP = 512    # max tokens per packed sequence
PACK_SHARD = 256  # docs per contiguous packing shard


def pack_sequences(
    docs: rd.Dataset, cap: int = PACK_CAP, shard: int = PACK_SHARD
) -> rd.Dataset:
    """Emits (doc_id, shard, pack, n_tokens): ``pack`` is the shard-local
    sequence index assigned by a greedy in-order scan — a new pack starts
    whenever adding the next document would exceed ``cap`` (documents are
    never split; an oversized document gets its own pack)."""

    def widen(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_tokens = np.fromiter(
            (len(x.split()) for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.int64()),
             "shard": pa.array(ids // shard, pa.int64()),
             "n_tokens": pa.array(n_tokens, pa.int64())}
        )

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        packs = np.empty(len(g), dtype=np.int64)
        acc = 0
        pack = -1
        for i, tok in enumerate(n):
            if pack < 0 or acc + tok > cap:
                pack += 1
                acc = int(tok)
            else:
                acc += int(tok)
            packs[i] = pack
        g["pack"] = packs
        return g[["doc_id", "shard", "pack", "n_tokens"]]

    return (
        docs.map_batches(widen, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pandas")
    )
