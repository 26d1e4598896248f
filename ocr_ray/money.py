"""Exact integer-cents money math shared by every SQL-twin pipeline.

DuckDB's ``round()`` is half-AWAY-FROM-ZERO; numpy/pyarrow default to
half-to-even (banker's). A value whose x*100 lands exactly on k+0.5
(e.g. 1.125 -> 112.5) would make the "bit-identical cents" parity
contract diverge by one cent under the defaults, so both helpers here
pin the DuckDB rule explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["cents", "cents_np"]


def cents(arr: pa.ChunkedArray | pa.Array, scale: float = 100.0) -> pa.Array:
    """round(x*scale) as int64, half away from zero (DuckDB round())."""
    return pc.cast(
        pc.round(pc.multiply(arr, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def cents_np(v: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """numpy twin of :func:`cents` (half away from zero)."""
    v = np.asarray(v, dtype=np.float64) * scale
    return (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
