"""Per-turn extraction chain — the engine's semantic core.

Replays the reference inference chain (SURVEY.md §3.1, reference
test_img.py:78-132 / DetectUtil.py:127-216) over one transcript turn:

    segment -> score units -> threshold -> dilate+group regions ->
    per-unit full-block proposals (restore) -> locality-aware NMS ->
    reading-order sort -> mean-confidence recompute + box filter ->
    deterministic span cap -> decode member units -> CTC collapse ->
    degenerate filter -> emit (start, end, text, score)

Every function is pure and deterministic; the pure-Python oracle
(ocr_ray.oracle) and the Ray Data stages (ocr_ray.stages) call EXACTLY
these functions, so per-turn parity is structural (SURVEY.md §7.4).

Offsets are char offsets into the NORMALIZED payload
(ocr_ray.textnorm.normalize_text).
"""

from __future__ import annotations

import numpy as np

from . import config as C
from .segment import Unit, detect_kind, segment
from .spanlib import canonicalize, nms_locality
from .textnorm import ctc_collapse, decode_entities, encode_token, normalize_text

__all__ = ["score_units", "propose_spans", "decode_span", "extract_turn"]


def score_units(units: list[Unit]) -> np.ndarray:
    """Dense unit confidence — the F_score analog (A1, SURVEY §2.3).

    score = clip(tag_weight * (0.5 + 0.5*text_density) - link_density, 0, 1);
    ignore-tagged units are masked to 0 (training-mask analog,
    reference DataPreprocess/DataGen.py:244-248).
    """
    get_w = C.TAG_WEIGHTS.get
    dw = C.DEFAULT_TAG_WEIGHT
    vals = [
        0.0
        if u.ignore
        else min(
            1.0,
            max(0.0, get_w(u.tag, dw) * (0.5 + 0.5 * u.text_density) - u.link_density),
        )
        for u in units
    ]
    return np.asarray(vals, dtype=np.float64)


def propose_spans(
    units: list[Unit],
    scores: np.ndarray,
    payload_len: int,
    counters: dict[str, int] | None = None,
) -> list[tuple[int, int, float]]:
    """Threshold, group, restore, NMS, order, filter — detect_contours analog
    (reference DetectUtil.py:127-216). Returns [(start, end, score), ...] in
    stable reading order with integer canonical offsets."""
    if counters is None:
        counters = {}
    if not units:
        return []

    # threshold (DetectUtil.py:153-155: strictly greater after binarize)
    score_list = scores.tolist()
    idx = [i for i, s in enumerate(score_list) if s > C.SCORE_THRESH]
    if not idx:
        return []

    # group passing units into regions, bridging <= DILATE_UNITS non-passing
    # units (the 1x3 dilation, DetectUtil.py:144-145); region members are ALL
    # units between the first and last passing unit (filled convex hull,
    # DetectUtil.py:160-169)
    regions: list[tuple[int, int]] = []  # inclusive unit-index ranges
    rs = re_ = idx[0]
    for i in idx[1:]:
        if i - re_ - 1 <= C.DILATE_UNITS:
            re_ = i
        else:
            regions.append((rs, re_))
            rs = re_ = i
    regions.append((rs, re_))

    # per-region per-unit full-block proposals (restore_rectangle analog,
    # DetectUtil.py:171-194: every member pixel proposes a full box carrying
    # the region score SUM); np-pairwise summation kept for exact float
    # parity with the previous vectorized form
    proposals: list[list[float]] = []
    for rs, re_ in regions:
        members = units[rs : re_ + 1]
        text_size = sum(u.end - u.start for u in members)
        if text_size < C.MIN_TEXT_SIZE:
            counters["drop_min_text_size"] = counters.get("drop_min_text_size", 0) + 1
            continue
        score_sum = float(scores[rs : re_ + 1].sum())
        for u in members:
            proposals.append([float(u.geo_start), float(u.geo_end), score_sum])
    if not proposals:
        return []

    # locality-aware NMS in emission order, then standard NMS
    # (locality_aware_nms.py:38-58)
    boxes = nms_locality(proposals, C.NMS_THRESH)
    if boxes.shape[0] == 0:
        return []

    # stable reading order (DetectUtil.py:201-203)
    box_rows = sorted(boxes.tolist(), key=lambda r: (r[0], r[1]))

    # recompute score as the length-weighted mean unit confidence over the
    # span, counting uncovered chars as 0 — the masked cv2.mean analog
    # (DetectUtil.py:209-212) — then filter > BOX_THRESH (line 214).
    # Two bit-identical paths: the numpy one computes the per-unit overlaps
    # vectorized but accumulates the (few) overlapping terms SEQUENTIALLY in
    # unit order — the exact float ops of the scalar loop — so output scores
    # cannot drift between paths (golden fixtures compare exact).
    n_units = len(units)
    vectorize = n_units * len(box_rows) >= 64
    if vectorize:
        u_starts = np.fromiter((u.start for u in units), np.float64, n_units)
        u_ends = np.fromiter((u.end for u in units), np.float64, n_units)
    kept: list[tuple[float, float, float]] = []
    for s, e, _ in box_rows:
        span_len = e - s
        if span_len <= 0:
            counters["drop_empty"] = counters.get("drop_empty", 0) + 1
            continue
        acc = np.float64(0.0)
        if vectorize:
            ov_arr = np.minimum(u_ends, e) - np.maximum(u_starts, s)
            mask = ov_arr > 0
            terms = scores[mask] * ov_arr[mask]
            for v in terms:
                acc += v
        else:
            for u, sc in zip(units, score_list):
                ov = min(u.end, e) - max(u.start, s)
                if ov > 0:
                    acc += sc * ov
        mean_score = float(acc / span_len)
        if mean_score > C.BOX_THRESH:
            kept.append((s, e, mean_score))
        else:
            counters["drop_box_thresh"] = counters.get("drop_box_thresh", 0) + 1
    if not kept:
        return []

    # deterministic span cap (max_box_num analog, DataGen.py:505-527, but
    # top-k by score instead of random sampling; drops are logged)
    if len(kept) > C.MAX_SPANS_PER_TURN:
        counters["drop_span_cap"] = counters.get("drop_span_cap", 0) + (
            len(kept) - C.MAX_SPANS_PER_TURN
        )
        kept = sorted(kept, key=lambda t: (-t[2], t[0], t[1]))[: C.MAX_SPANS_PER_TURN]
        kept = sorted(kept, key=lambda t: (t[0], t[1]))

    # canonical integer offsets + degenerate filter (test_img.py:123-125)
    out: list[tuple[int, int, float]] = []
    for s, e, sc in kept:
        a, b_ = canonicalize(s, e)
        a = max(0, min(a, payload_len))
        b_ = max(0, min(b_, payload_len))
        if b_ - a < C.MIN_SPAN_LEN:
            counters["drop_degenerate"] = counters.get("drop_degenerate", 0) + 1
            continue
        out.append((a, b_, sc))
    return out


def decode_span(
    norm_text: str,
    kind: str,
    units: list[Unit],
    start: int,
    end: int,
    counters: dict[str, int] | None = None,
    _bounds: tuple[np.ndarray, np.ndarray] | None = None,
) -> str:
    """Decode one span: gather member units (RoIRotate crop analog, A2),
    order them — pdfish by (page, y, x) reading order (O3 analog,
    DetectUtil.py:169), others by document order — project tokens onto the
    alphabet (M11), truncate to the decode window (max_box_width analog),
    CTC-collapse (A5, Module/RecognitionLoss.py:33-38), join with spaces.

    ``_bounds`` is an optional (starts, ends) numpy pair precomputed by the
    caller for turns with many units: the member gather then runs as one
    vectorized mask instead of a Python scan (identical selection)."""
    if counters is None:
        counters = {}
    if _bounds is not None:
        u_starts, u_ends = _bounds
        members = [
            units[i] for i in np.nonzero((u_starts < end) & (u_ends > start))[0]
        ]
    else:
        members = [u for u in units if u.start < end and u.end > start]
    if kind == C.PAYLOAD_PDFISH:
        members = sorted(members, key=lambda u: (u.page, u.y, u.x, u.start))
    html = kind == C.PAYLOAD_HTML
    tokens: list[str] = []
    extend = tokens.extend
    for u in members:
        a, b = max(u.start, start), min(u.end, end)
        seg = norm_text[a:b]
        if html and "&" in seg:
            seg = decode_entities(seg)
        extend(map(encode_token, seg.split()))
    if len(tokens) > C.MAX_DECODE_TOKENS:
        counters["drop_window_tokens"] = counters.get("drop_window_tokens", 0) + (
            len(tokens) - C.MAX_DECODE_TOKENS
        )
        tokens = tokens[: C.MAX_DECODE_TOKENS]
    return " ".join(ctc_collapse(tokens, C.DECODER_BLANKS))


def extract_turn(
    raw_text: str, counters: dict[str, int] | None = None
) -> list[dict]:
    """Full per-turn chain. Returns span dicts in stable reading order:
    {span_idx, start, end, text, score} with offsets into the normalized
    payload (FIXTURES.md §2 golden-span schema)."""
    if counters is None:
        counters = {}
    norm = normalize_text(raw_text)
    if not norm:
        return []
    kind = detect_kind(norm)
    units = segment(norm, kind)
    if not units:
        return []
    scores = score_units(units)
    spans = propose_spans(units, scores, len(norm), counters)
    bounds = None
    if len(units) * len(spans) >= 64:
        bounds = (
            np.fromiter((u.start for u in units), np.int64, len(units)),
            np.fromiter((u.end for u in units), np.int64, len(units)),
        )
    out = []
    for i, (s, e, sc) in enumerate(spans):
        text = decode_span(norm, kind, units, s, e, counters, _bounds=bounds)
        out.append({"span_idx": i, "start": s, "end": e, "text": text, "score": sc})
    return out
