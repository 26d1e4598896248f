"""Normalizer stage (M1/F12 analog, SURVEY.md §2.2).

Stateless ``map_batches`` task: NFC + BOM/zero-width strip + newline
canonicalization on the ``text`` column, plus a deterministic payload-kind
tag. Arrow in / Arrow out.
"""

from __future__ import annotations

import pyarrow as pa

from ..segment import detect_kind
from ..textnorm import normalize_text

__all__ = ["normalize_batch"]


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Replace ``text`` with its normalized form and append ``kind``.

    The per-value Python loop is confined to this one pass; downstream
    stages consume the already-normalized column. (The hot work — regex
    segmentation and scoring — happens in the extractor actor stage.)
    """
    raw = batch.column("text").to_pylist()
    norm = [normalize_text(t) if t else "" for t in raw]
    kinds = [detect_kind(t) if t else "plain" for t in norm]
    out = batch.set_column(
        batch.schema.get_field_index("text"), "text", pa.array(norm, pa.string())
    )
    return out.append_column("kind", pa.array(kinds, pa.string()))
