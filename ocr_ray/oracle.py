"""Reference-semantics oracle: the single-process, pure-Python extractor.

This is the SPEC the Ray Data pipeline must match per turn (SURVEY.md
§7.1 step 2). It deliberately shares every semantic function with the
pipeline (ocr_ray.extract) so parity cannot drift; what it does NOT share
is the execution model — it is a plain sequential loop, the shape of the
reference's one-image-at-a-time inference (reference test_img.py:30-132).
"""

from __future__ import annotations

from .extract import extract_turn

__all__ = ["extract_table"]


def extract_table(turns: list[dict]) -> list[dict]:
    """Run the extraction chain sequentially over turn dicts
    (conv_id, turn_idx, text, ...) in stable (conv_id, turn_idx) order;
    returns flat golden-span rows (FIXTURES.md §2 schema)."""
    rows: list[dict] = []
    counters: dict[str, int] = {}
    for t in sorted(turns, key=lambda r: (r["conv_id"], r["turn_idx"])):
        for span in extract_turn(t["text"], counters):
            rows.append(
                {
                    "conv_id": t["conv_id"],
                    "turn_idx": t["turn_idx"],
                    "span_idx": span["span_idx"],
                    "start": span["start"],
                    "end": span["end"],
                    "text": span["text"],
                    "score": span["score"],
                }
            )
    return rows
