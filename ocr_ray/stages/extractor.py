"""Extraction stages: the scorer/proposer/decoder chain as Ray Data
operators (A1/A2/A4/A5/M4-M10/D1-D2 analogs, SURVEY.md §2).

Two granularities:

- ``SpanExtractor`` — the fused actor-pool stage used by the production
  pipeline: normalized turn batch in -> flat span rows out. One pass per
  turn, no intermediate serialization. State (rule tables, compiled
  regexes) is built once per actor in ``__init__`` and the per-batch work
  calls the shared semantic core (ocr_ray.extract), which guarantees
  parity with the oracle.
- ``UnitScorer`` — the standalone scorer stage (A1 analog) that emits the
  dense unit/score table, used by operator-level conformance tests and
  the fixture queries (FIXTURES.md §3).
"""

from __future__ import annotations

import pyarrow as pa

from .. import config as C
from ..extract import extract_turn, propose_spans, score_units
from ..segment import segment

__all__ = ["SpanExtractor", "UnitScorer"]

SPAN_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("span_idx", pa.int32()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("text", pa.string()),
        ("score", pa.float64()),
    ]
)

UNIT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("unit_idx", pa.int32()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("geo_start", pa.int64()),
        ("geo_end", pa.int64()),
        ("tag", pa.string()),
        ("score", pa.float64()),
    ]
)


def extract_batch_counted(batch: pa.Table, counters: dict[str, int]) -> pa.Table:
    """The fused per-batch extraction core shared by every execution form
    (actor pool, stateless task pool, stats-reporting pass): normalized
    turn batch in -> flat span rows out, with every deterministic drop and
    dead-lettered row recorded in ``counters``."""
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()

    out_conv: list[str] = []
    out_turn: list[int] = []
    out_sidx: list[int] = []
    out_start: list[int] = []
    out_end: list[int] = []
    out_text: list[str] = []
    out_score: list[float] = []

    for cid, tix, text in zip(conv_ids, turn_idxs, texts):
        if not text:
            counters["empty_payloads"] = counters.get("empty_payloads", 0) + 1
            continue
        try:
            spans = extract_turn(text, counters)
        except Exception:  # noqa: BLE001 — dead-letter, never kill the task
            # per-row error capture: the reference's blanket try/except
            # kills the whole generator (DataGen.py:576-580); the engine
            # drops the single row and counts it instead
            counters["error_rows"] = counters.get("error_rows", 0) + 1
            continue
        for span in spans:
            out_conv.append(cid)
            out_turn.append(tix)
            out_sidx.append(span["span_idx"])
            out_start.append(span["start"])
            out_end.append(span["end"])
            out_text.append(span["text"])
            out_score.append(span["score"])

    return pa.Table.from_arrays(
        [
            pa.array(out_conv, pa.string()),
            pa.array(out_turn, pa.int32()),
            pa.array(out_sidx, pa.int32()),
            pa.array(out_start, pa.int64()),
            pa.array(out_end, pa.int64()),
            pa.array(out_text, pa.string()),
            pa.array(out_score, pa.float64()),
        ],
        schema=SPAN_SCHEMA,
    )


class SpanExtractor:
    """Fused per-turn extraction chain as an actor-pool ``map_batches``
    stage. ``__init__`` runs once per actor (reference analog: model-weight
    load, test_img.py:46-53); ``__call__`` runs per batch.

    Emits the golden-span schema (FIXTURES.md §2) plus a per-actor drop
    counter snapshot retrievable through the ``counters`` column of the
    lineage sidecar (see ocr_ray.state.lineage).
    """

    def __init__(self) -> None:
        # Touch the rule tables so any config error surfaces at actor start,
        # not first batch; regexes in ocr_ray.segment are compiled at import.
        self._tag_weights = dict(C.TAG_WEIGHTS)
        self.counters: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch_counted(batch, self.counters)


class UnitScorer:
    """Standalone dense-unit scorer (A1 analog): turn batch in -> exploded
    unit table with per-unit geometry and confidence."""

    def __init__(self) -> None:
        self.counters: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        kinds = (
            batch.column("kind").to_pylist()
            if "kind" in batch.column_names
            else [None] * len(texts)
        )

        rows: dict[str, list] = {k: [] for k in UNIT_SCHEMA.names}
        for cid, tix, text, kind in zip(conv_ids, turn_idxs, texts, kinds):
            if not text:
                continue
            units = segment(text, kind)
            scores = score_units(units)
            for i, (u, s) in enumerate(zip(units, scores)):
                rows["conv_id"].append(cid)
                rows["turn_idx"].append(tix)
                rows["unit_idx"].append(i)
                rows["start"].append(u.start)
                rows["end"].append(u.end)
                rows["geo_start"].append(u.geo_start)
                rows["geo_end"].append(u.geo_end)
                rows["tag"].append(u.tag)
                rows["score"].append(float(s))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in UNIT_SCHEMA],
            schema=UNIT_SCHEMA,
        )


NESTED_SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("span_idx", pa.int32()),
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("text", pa.string()),
            ("score", pa.float64()),
        ]
    )
)


def nested_spans_batch(batch: pa.Table) -> pa.Table:
    """Nested-column variant of the extractor (SURVEY §1.2: keep spans as a
    ``list<struct>`` column per turn to avoid any parent join, J1): one row
    per turn with its spans nested, plus the per-turn concatenated
    extracted text (the north rule's per-turn text-equality artifact)."""
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    nested: list[list[dict]] = []
    concat: list[str] = []
    for text in texts:
        spans = extract_turn(text) if text else []
        nested.append(spans)
        concat.append(" ".join(s["text"] for s in spans if s["text"]))
    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(turn_idxs, pa.int32()),
            pa.array(nested, NESTED_SPAN_TYPE),
            pa.array(concat, pa.string()),
        ],
        names=["conv_id", "turn_idx", "spans", "turn_text"],
    )


def metrics_batch(batch: pa.Table) -> pa.Table:
    """STANDALONE audit form: runs the extraction chain over a batch purely
    to count every deterministic drop (SURVEY.md §7.4 'silent-drop
    semantics ... deterministic and logged') plus dead-lettered error
    rows. Emits (reason, count) partial rows; aggregate with
    groupby(reason).sum.

    Production pipelines do NOT use this (it would run the most expensive
    stage twice): the same totals fall out of the single production pass
    via ``extract_spans(..., stats=True)`` /
    ``extract_with_metrics`` (ocr_ray.pipelines.extract), which this
    function's per-batch semantics define and tests pin."""
    counters: dict[str, int] = {}
    turns = 0
    empty = 0
    errors = 0
    spans = 0
    for text in batch.column("text").to_pylist():
        turns += 1
        if not text:
            empty += 1
            continue
        try:
            spans += len(extract_turn(text, counters))
        except Exception:  # noqa: BLE001
            errors += 1
    counters["turns_in"] = turns
    counters["empty_payloads"] = empty
    counters["error_rows"] = errors
    counters["spans_out"] = spans
    return pa.Table.from_pydict(
        {
            "reason": list(counters.keys()),
            "count": pa.array(list(counters.values()), pa.int64()),
        }
    )


def propose_only(batch: pa.Table) -> pa.Table:
    """Stateless propose/NMS/order stage (M4-M8 + D1/D2) without decode —
    for conformance fixtures: turn batch in -> (start, end, score) spans."""
    from ..textnorm import normalize_text

    rows: dict[str, list] = {
        "conv_id": [], "turn_idx": [], "span_idx": [],
        "start": [], "end": [], "score": [],
    }
    for cid, tix, text in zip(
        batch.column("conv_id").to_pylist(),
        batch.column("turn_idx").to_pylist(),
        batch.column("text").to_pylist(),
    ):
        norm = normalize_text(text or "")
        units = segment(norm)
        spans = propose_spans(units, score_units(units), len(norm)) if units else []
        for i, (s, e, sc) in enumerate(spans):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(tix)
            rows["span_idx"].append(i)
            rows["start"].append(s)
            rows["end"].append(e)
            rows["score"].append(sc)
    return pa.Table.from_pydict(rows)
