"""Accounting guards on the __ray_entry__ surface.

The driver grades only the FIRST 50 ``queries()`` entries
(CORRECTNESS_r0*.json each hold exactly 50 rows); entries past the
"oracle-backed overflow" marker are gate/pytest-verified instead. Twice
now (doc_token_stats through r2/r3, events_pruned_scan in r4) an entry
sat at position 51 — labeled in-window, silently never graded. These
tests pin the accounting so it can't drift again.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

GRADED_WINDOW = 50
_MARKER = "oracle-backed overflow"


def _entry_source():
    with open(os.path.join(REPO, "__ray_entry__.py")) as f:
        return f.read()


def test_graded_window_is_exactly_50():
    """Exactly GRADED_WINDOW query keys precede the overflow marker in
    the queries() dict literal (source-level check: dict order is
    insertion order, and the driver takes the first 50)."""
    src = _entry_source()
    start = src.index("return {", src.index("def queries"))
    head = src[start:src.index(_MARKER, start)]
    above = re.findall(r'^\s+"([a-z0-9_]+)":', head, re.M)
    assert len(above) == GRADED_WINDOW, (
        f"{len(above)} queries sit above the overflow marker; the driver "
        f"grades exactly {GRADED_WINDOW} — entry {GRADED_WINDOW + 1}+ "
        f"would be silently ungraded: {above[GRADED_WINDOW:]}"
    )


def test_queries_oracles_consistent():
    """Every graded-window query has an oracle_sql() twin (the driver's
    hash gate needs both), keys are unique, and every oracle key names a
    real query."""
    import __ray_entry__ as entry

    q = entry.queries()
    sql = entry.oracle_sql()
    names = list(q)
    assert len(names) == len(set(names))
    missing = [k for k in sql if k not in q]
    assert not missing, f"oracle_sql keys without a queries() entry: {missing}"
    window = names[:GRADED_WINDOW]
    no_oracle = [k for k in window if k not in sql]
    assert not no_oracle, (
        f"graded-window queries missing an oracle (driver would record "
        f"the weaker rows-only check): {no_oracle}"
    )
