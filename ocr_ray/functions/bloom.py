"""Bloom filter for broadcast semi/anti-join pre-filtering (the guide's
"broadcast the key set (or a Bloom filter of it)" pattern).

At sandbox scale the exact key set broadcasts fine; at 10^12-row scale the
build side's keys don't fit, so a Bloom filter pre-filters inside
map_batches — exact for semi-join *candidates* (no false negatives);
anti-joins re-verify survivors against the exact set shard-by-shard.

Deterministic double hashing (Kirsch-Mitzenmacker) over
pd.util.hash_array — process-independent, vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["BloomFilter"]


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n_bits = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        # power-of-two size so double hashing with an odd step is full-cycle
        self.n_bits = 1 << max(6, int(np.ceil(np.log2(n_bits))))
        self.k = max(1, int(round((self.n_bits / max(1, capacity)) * np.log(2))))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    @staticmethod
    def _mix(v: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — pd.util.hash_array's numeric hash is
        near-linear for integers, which correlates bucket positions for
        sequential keys; a strong bit-mix fixes the observed fp blowup."""
        v = v + np.uint64(0x9E3779B97F4A7C15)
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        return v

    def _positions(self, values: np.ndarray) -> np.ndarray:
        base = pd.util.hash_array(np.asarray(values), categorize=False)
        h1 = self._mix(base)
        h2 = self._mix(base ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & np.uint64(self.n_bits - 1)

    def add(self, values: np.ndarray) -> None:
        pos = self._positions(np.asarray(values)).ravel()
        np.bitwise_or.at(self.bits, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % 64))

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership test; no false negatives."""
        pos = self._positions(np.asarray(values))
        word = self.bits[(pos // 64).astype(np.int64)]
        hit = (word >> (pos % 64)) & np.uint64(1)
        return hit.all(axis=0).astype(bool)
