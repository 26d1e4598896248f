"""The flagship pipeline: transcript turns -> extracted content spans.

Engine shape (SURVEY.md §3.1 "Engine shape"):

    read_parquet(turns, pruned columns)
      -> map_batches(SpanExtractor, actor pool)      # fused score/propose/decode
      -> reconcile: groupby(conv_id) + stable (turn_idx, span_idx) in-group
         order -> per-conversation global span ordinal                (O2 analog)
      -> write_parquet(partitioned, resumable)

The extractor stage is the only payload-heavy stage; reconciliation runs
over the (much smaller) span rows. The reconciliation shuffle is the one
semantically required wide operation (SURVEY.md §7.3) and ships a salted
two-phase variant for skewed mega-conversations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import config as C
from ..stages.extractor import SpanExtractor

__all__ = ["read_turns", "extract_spans", "reconcile", "run_extraction"]

TURN_COLUMNS = ["conv_id", "turn_idx", "text"]

# Salt width for the two-phase reconciliation: one salt bucket per
# SALT_TURNS consecutive turn indices, so a mega-conversation splits into
# many groups while bucket order still follows turn order.
SALT_TURNS = 64


def read_turns(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Pruned-at-the-read turn source (S1/S2 analog): only the columns the
    extraction chain needs leave storage."""
    return rd.read_parquet(path, columns=columns or TURN_COLUMNS)


def extract_spans(
    turns: rd.Dataset,
    *,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Turns -> flat span rows via the fused actor-pool extractor.

    ``concurrency=None`` sizes an autoscaling pool (1, cluster CPUs); pass
    an explicit int/(min,max) to co-size with other stages.
    """
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    kwargs = {"concurrency": concurrency}
    return turns.map_batches(
        SpanExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        **kwargs,
    )


def _assign_local(group: pd.DataFrame) -> pd.DataFrame:
    """Stable in-group ordering + local ordinal (one salt bucket)."""
    group = group.sort_values(["turn_idx", "span_idx"], kind="mergesort")
    group["local_seq"] = np.arange(len(group), dtype=np.int64)
    return group


def reconcile(spans: rd.Dataset, *, salted: bool = True) -> rd.Dataset:
    """Span reconciliation (the O2 stable-ordering contract inter-turn):
    assign each span its global per-conversation ordinal ``span_seq`` under
    stable (turn_idx, span_idx) order.

    salted=True runs the skew-safe two-phase form (SURVEY.md §7.4):
      phase 1: groupby (conv_id, salt=turn_idx // SALT_TURNS); local stable
               sort + local ordinal per bucket;
      phase 2: per-(conv_id, salt) counts -> prefix offsets (tiny table,
               broadcast via ray.put) -> span_seq = offset + local_seq.
    A conversation 1000x the median therefore never forms one giant group.

    salted=False is the direct groupby(conv_id) form (fine when no key is
    skewed); both produce identical output.
    """
    if not salted:
        def assign(group: pd.DataFrame) -> pd.DataFrame:
            group = group.sort_values(["turn_idx", "span_idx"], kind="mergesort")
            group["span_seq"] = np.arange(len(group), dtype=np.int64)
            return group

        return spans.groupby("conv_id").map_groups(assign, batch_format="pandas")

    def add_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        salt = pc.divide(pc.cast(batch["turn_idx"], pa.int64()), SALT_TURNS)
        return batch.append_column("salt", pc.cast(salt, pa.int64()))

    # Materialize once: both phases consume this dataset, and this is also
    # the natural mid-pipeline checkpoint (span rows are ~2 orders of
    # magnitude smaller than the payload-bearing input).
    salted_ds = spans.map_batches(add_salt, batch_format="pyarrow").materialize()
    local = salted_ds.groupby(["conv_id", "salt"]).map_groups(
        _assign_local, batch_format="pandas"
    )

    # phase 2: per-bucket counts -> prefix offsets, broadcast once
    counts = (
        salted_ds.groupby(["conv_id", "salt"])
        .count()
        .to_pandas()  # one row per (conv, salt); small even for mega convs
    )
    if counts.empty:  # empty input: nothing to reconcile
        def drop_salt(df: pd.DataFrame) -> pd.DataFrame:
            df["span_seq"] = np.zeros(len(df), dtype=np.int64)
            return df.drop(columns=["salt"], errors="ignore")

        return salted_ds.map_batches(drop_salt, batch_format="pandas")
    counts = counts.sort_values(["conv_id", "salt"], kind="mergesort")
    counts["offset"] = counts.groupby("conv_id")["count()"].cumsum() - counts["count()"]
    # One row per (conv_id, salt): tiny at sandbox scale. At 10^12-turn
    # scale this becomes a Dataset-side broadcast-partitioned join on
    # (conv_id, salt) instead of a driver dict — same two-phase shape.
    offsets = {
        (c, int(s)): int(o)
        for c, s, o in zip(counts["conv_id"], counts["salt"], counts["offset"])
    }
    offsets_ref = ray.put(offsets)

    def add_offset(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(offsets_ref)
        off = [
            table[(c, int(s))] for c, s in zip(df["conv_id"], df["salt"])
        ]
        df["span_seq"] = np.asarray(off, dtype=np.int64) + df["local_seq"].to_numpy()
        return df.drop(columns=["salt", "local_seq"])

    return local.map_batches(add_offset, batch_format="pandas")


def run_extraction(
    turns_path: str,
    out_dir: str | None = None,
    *,
    batch_size: int = 256,
    salted: bool = True,
) -> rd.Dataset:
    """End-to-end: read -> extract -> reconcile (-> write if out_dir).

    Output is a parquet directory of part files (resumable layout: rerun
    with a fresh out_dir or let ocr_ray.state.checkpoint skip completed
    partitions)."""
    spans = extract_spans(read_turns(turns_path), batch_size=batch_size)
    spans = reconcile(spans, salted=salted)
    if out_dir is not None:
        spans.write_parquet(out_dir)
    return spans
