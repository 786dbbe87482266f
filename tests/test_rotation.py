"""Mechanical rotation honesty for the driver correctness window.

The driver records DuckDB-oracle rows for the FIRST 50 entries of
``__spark_entry__.queries()`` only, so with >50 registry queries the
window must rotate: every query gets a driver row at least every other
round. Round 5's VERDICT found two queries
(repeated_spans_k8, dedup_lines_within_doc) that sat just outside the
window for five consecutive rounds while a hand-maintained comment
claimed otherwise — this test replaces that comment with a failing
check (r5 VERDICT item 2).

Invariant (round-6 VERDICT item 1 revision): any query absent from the
UNION of the LAST TWO CORRECTNESS_r*.json files must be inside the
current first-50 window. The earlier formulation ("absent from the
latest file") intentionally went red the instant the driver wrote the
round-end CORRECTNESS file, which meant pytest was red at every judge
time — a forcing function that normalized red CI. The union-of-last-two
form keeps the same guarantee (a query green in round N drops out of
the union when round N+2's file lands, so it must re-enter the window
by round N+2 — i.e. at most one rested round between driver rows) while
staying green at round boundaries: right after round N's file is
written, every round-N-rested query is still covered by round N-1's
file. Rotation remains the first task of each round because a round
N+1 ordering that fails to front the round-N-rested queries goes red
as soon as CORRECTNESS_r{N+1} lands mid-verification — and
tools/check_oracles.py plus this test run before every commit.
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
    covered: set[str] = set()
    for p in files[-2:]:
        covered |= set(json.loads(p.read_text()).keys())
    window = set(order[:WINDOW])
    stale = [
        name
        for name in order
        if name not in covered and name not in window
    ]
    assert not stale, (
        f"registry queries absent from the union of the last two driver "
        f"windows ({[p.name for p in files[-2:]]}) AND outside the "
        f"current first-{WINDOW}: {stale} — move them to the front of "
        f"_REGISTRY (every query must get a driver row at least every "
        f"other round)"
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
