"""Span-geometry library: 1-D interval analogs of the reference's rotated-box
geometry (SURVEY.md §2.8).

Every function here is shared verbatim by the pure-Python oracle
(ocr_ray.oracle) and the Ray Data operators (ocr_ray.stages) so that
per-turn parity cannot drift (SURVEY.md §7.4 "hard parts").

Interval convention: a span proposal is ``(start: float, end: float,
score: float)`` with ``start < end`` over character offsets into the
normalized turn payload. Mirrors the N×9 RBOX rows of the reference
(reference: locality_aware_nms.py:38-58, DetectUtil.py:189-216).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "interval_iou",
    "weighted_merge",
    "standard_nms",
    "nms_locality",
    "reading_order",
    "canonicalize",
]


def interval_iou(g: np.ndarray, p: np.ndarray) -> float:
    """IoU of two (start, end) intervals.

    Analog of the shapely polygon IoU (reference locality_aware_nms.py:5-15):
    invalid (empty / inverted) intervals contribute 0, as do disjoint pairs.
    """
    g0, g1 = g[0], g[1]
    p0, p1 = p[0], p[1]
    if g1 <= g0 or p1 <= p0:
        return 0.0
    inter = min(g1, p1) - max(g0, p0)
    if inter <= 0:
        return 0.0
    union = (g1 - g0) + (p1 - p0) - inter
    if union == 0:
        return 0.0
    return inter / union


def weighted_merge(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Score-weighted coordinate merge; scores add.

    Exact analog of reference locality_aware_nms.py:18-21 (coordinates are
    averaged weighted by score, the merged score is the SUM — mutates and
    returns ``g`` just like the reference).
    """
    g[:2] = (g[2] * g[:2] + p[2] * p[:2]) / (g[2] + p[2])
    g[2] = g[2] + p[2]
    return g


def standard_nms(S: np.ndarray, thres: float) -> np.ndarray:
    """Greedy score-descending NMS over (start, end, score) rows.

    Analog of reference locality_aware_nms.py:24-35, including the ``<=``
    survival comparison and ``np.argsort[::-1]`` tie behavior.

    Two bit-identical execution paths: a scalar loop for small inputs
    (numpy call overhead dominates below ~32 rows — the common case is a
    handful of proposals per turn) and the batched numpy form beyond.
    Ordering always comes from the same np.argsort so tie behavior cannot
    diverge between paths; the per-pair float arithmetic is the same IEEE
    ops either way."""
    order = np.argsort(S[:, 2])[::-1]
    if S.shape[0] <= 32:
        starts = S[:, 0].tolist()
        ends = S[:, 1].tolist()
        alive = order.tolist()
        keep: list[int] = []
        while alive:
            i = alive[0]
            keep.append(i)
            si, ei = starts[i], ends[i]
            li = ei - si
            nxt: list[int] = []
            for r in alive[1:]:
                inter = min(ends[r], ei) - max(starts[r], si)
                lr = ends[r] - starts[r]
                union = li + lr - inter
                ovr = (
                    inter / union
                    if (li > 0 and lr > 0 and inter > 0 and union != 0)
                    else 0.0
                )
                if ovr <= thres:
                    nxt.append(r)
            alive = nxt
        return S[keep]

    starts, ends = S[:, 0], S[:, 1]
    lens = ends - starts
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        if rest.size == 0:
            break
        inter = np.minimum(ends[rest], ends[i]) - np.maximum(starts[rest], starts[i])
        union = lens[i] + lens[rest] - inter
        valid = (lens[i] > 0) & (lens[rest] > 0) & (inter > 0) & (union != 0)
        ovr = np.where(valid, inter / np.where(union == 0, 1.0, union), 0.0)
        order = rest[ovr <= thres]
    return S[keep]


def nms_locality(polys: np.ndarray, thres: float = 0.3) -> np.ndarray:
    """Locality-aware NMS (EAST): sequential weighted merge of overlapping
    neighbors in emission order, then standard NMS over the survivors.

    Exact analog of reference locality_aware_nms.py:38-58 — the single
    forward pass over ``polys`` in their given order is order-DEPENDENT and
    part of the parity contract (SURVEY.md §2.7 D1).
    """
    S: list[list[float]] = []
    p: list[float] | None = None
    for g0, g1, gs in polys.tolist() if isinstance(polys, np.ndarray) else polys:
        if p is not None:
            # inline interval_iou on scalars (same arithmetic)
            iou = 0.0
            if g1 > g0 and p[1] > p[0]:
                inter = min(g1, p[1]) - max(g0, p[0])
                if inter > 0:
                    union = (g1 - g0) + (p[1] - p[0]) - inter
                    if union != 0:
                        iou = inter / union
            if iou > thres:
                # weighted_merge(g, p) on scalars (locality_aware_nms.py:18-21)
                tot = gs + p[2]
                p = [
                    (gs * g0 + p[2] * p[0]) / tot,
                    (gs * g1 + p[2] * p[1]) / tot,
                    tot,
                ]
                continue
            S.append(p)
        p = [g0, g1, gs]
    if p is not None:
        S.append(p)
    if len(S) == 0:
        return np.zeros((0, 3))
    return standard_nms(np.array(S), thres)


def reading_order(spans: np.ndarray) -> np.ndarray:
    """Stable reading-order sort by (start, end).

    Analog of the reference's post-NMS ``sorted(key=lambda k: [k[1], k[0]])``
    (y-then-x) ordering (DetectUtil.py:201-203) — the stable ordering
    contract every downstream stage relies on.
    """
    if spans.shape[0] == 0:
        return spans
    order = sorted(range(spans.shape[0]), key=lambda i: (spans[i, 0], spans[i, 1]))
    return spans[order]


def canonicalize(start: float, end: float) -> tuple[int, int]:
    """Canonical integer span: truncate-toward-zero like the reference's
    ``box.astype(np.int32)`` at emission (test_img.py:123), normalized so
    start <= end (sort_poly analog, DetectUtil.py:219-225)."""
    a, b = int(start), int(end)
    if a > b:
        a, b = b, a
    return a, b
