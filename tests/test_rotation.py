"""Mechanical rotation honesty for the driver correctness window.

The driver records DuckDB-oracle rows for the FIRST 50 entries of
``__spark_entry__.queries()`` only, so with >50 registry queries the
window must rotate: every query may rest at most ONE round between
driver rows. Round 5's VERDICT found two queries
(repeated_spans_k8, dedup_lines_within_doc) that sat just outside the
window for five consecutive rounds while a hand-maintained comment
claimed otherwise — this test replaces that comment with a failing
check (r5 VERDICT item 2).

Invariant: every query may rest AT MOST ONE round, so any query
absent from the LATEST CORRECTNESS_r*.json must be inside the current
first-50 window (about to get its row this round). This is strictly
stronger than the union-of-last-two formulation (which would permit a
second consecutive rested round); with 93 registered queries the
arithmetic always fits: ≤43 absent from a 50-row file. Queries new
this round have no file presence and are likewise forced into the
window. Note the deliberate forcing function: the moment the driver
writes a new CORRECTNESS file at round end, this test goes red until
the next round's rotation is done — rotation is the first task of
every round, not an optional cleanup.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50


def _registry_order() -> list[str]:
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def _correctness_files() -> list[Path]:
    files = [
        p
        for p in REPO.glob("CORRECTNESS_r*.json")
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", p.name)
    ]
    return sorted(
        files, key=lambda p: int(re.search(r"r(\d+)", p.name).group(1))
    )


def test_window_is_50_or_registry_smaller():
    order = _registry_order()
    assert len(order) == len(set(order)), "duplicate registry keys"
    # the rotation problem only exists with >WINDOW queries; if the
    # registry ever shrinks below it, every query is always checked
    if len(order) <= WINDOW:
        return


def test_no_query_rests_more_than_one_round():
    order = _registry_order()
    if len(order) <= WINDOW:
        return
    files = _correctness_files()
    assert files, "no CORRECTNESS_r*.json present — driver never ran?"
    latest = files[-1]
    covered = set(json.loads(latest.read_text()).keys())
    window = set(order[:WINDOW])
    stale = [
        name
        for name in order
        if name not in covered and name not in window
    ]
    assert not stale, (
        f"registry queries absent from the latest driver window "
        f"({latest.name}) AND outside the current first-{WINDOW}: "
        f"{stale} — move them to the front of _REGISTRY (every query "
        f"must get a driver row at least every other round; if this "
        f"fired right after a new CORRECTNESS file landed, rotate "
        f"the window now)"
    )


def test_never_checked_queries_front_loaded():
    """A query that has NEVER appeared in any driver correctness file
    must be inside the current window — this is the exact failure mode
    of rounds 1-5 (two queries parked at positions 50/51 forever)."""
    order = _registry_order()
    if len(order) <= WINDOW:
        return
    ever: set[str] = set()
    for p in _correctness_files():
        ever |= set(json.loads(p.read_text()).keys())
    window = set(order[:WINDOW])
    never = [n for n in order if n not in ever and n not in window]
    assert not never, (
        f"queries with no driver row in ANY round and outside the "
        f"first-{WINDOW} window: {never}"
    )
