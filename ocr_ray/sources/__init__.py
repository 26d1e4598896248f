"""Source connectors (SURVEY.md §2.1 S-ops).

The implementations live beside the pipeline that tunes their block
sizing (ocr_ray.pipelines.extract); this package re-exports them as the
stable source API:

- read_turns        — pruned parquet turn source (column pruning, role
                      predicate pushdown, block sizing)
- read_turns_any    — parquet / csv (newlines-in-values) / json-lines
- training_reader   — seeded shuffled batch feed (manifest-shuffle analog)
- ensure_transcripts — deterministic synthetic corpus source
"""

from ..corpus import ensure_transcripts
from ..pqread import read_parquet
from ..pipelines.extract import read_turns, read_turns_any, training_reader

__all__ = ["read_turns", "read_turns_any", "training_reader", "ensure_transcripts", "read_parquet"]
