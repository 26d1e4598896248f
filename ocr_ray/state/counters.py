"""Named stats-actor counter sink: production pipelines report per-batch
counter deltas (turns_in, empty_payloads, error_rows, drop_*, spans_out)
to ONE actor instead of re-running the extraction chain in a second audit
pass (the reference logs drops inline during its single inference pass,
test_img.py:78-132; the engine's equivalent is this side-channel).

Totals are sums of per-batch deltas — associative and commutative, so the
result is deterministic regardless of task scheduling order.
"""

from __future__ import annotations

import ray

__all__ = ["CounterSink"]


@ray.remote(num_cpus=0)
class CounterSink:
    """Accumulates integer counter deltas; read with ``totals()``."""

    def __init__(self) -> None:
        self._totals: dict[str, int] = {}

    def add(self, delta: dict[str, int]) -> None:
        t = self._totals
        for k, v in delta.items():
            t[k] = t.get(k, 0) + int(v)

    def totals(self) -> dict[str, int]:
        return dict(self._totals)
