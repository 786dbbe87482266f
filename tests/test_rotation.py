"""Mechanical rotation honesty for the driver correctness window.

The driver records DuckDB-oracle rows for the FIRST 50 entries of
``__spark_entry__.queries()`` only, so with >50 registry queries the
window must rotate: every query gets a driver row at least every other
round. Round 5's VERDICT found two queries
(repeated_spans_k8, dedup_lines_within_doc) that sat just outside the
window for five consecutive rounds while a hand-maintained comment
claimed otherwise — this test replaces that comment with a failing
check (r5 VERDICT item 2).

Invariant (r6 VERDICT item 1, tightened after r7 review, generalized
for registries >100 in r8): with N registry queries, any query absent
from the union of the newest ``ceil(N/50) - 1`` CORRECTNESS files the
CURRENT REGISTRY ORDERING COULD HAVE KNOWN ABOUT must be inside the
first-50 window. "Could have known about" = committed no later than
the last commit touching __spark_entry__.py; a CORRECTNESS file newer
than the registry's last commit (the driver's round-end write) is
excluded, so the suite stays GREEN at round boundaries — but the
moment the next round touches the registry, that file becomes binding
and the same commit must carry the rotation.

For N <= 100, ceil(N/50) - 1 = 1, so this is EXACTLY the r7 strict
rule: checked against the single newest binding file, not a union (a
plain union-of-last-two at N <= 100 would quietly permit two
consecutive rested rounds, because during round N+1 the round-(N-1)
file is still in the union). For N > 100 the strict rule is
pigeonhole-impossible — N queries, 50 driver rows per round, so over
any 2 rounds at most 100 distinct queries get a row — and a
``ceil(N/50)``-round revisit is the tightest guarantee ANY ordering
can provide; the union width grows exactly as slowly as N forces it
to. Fallback when git metadata is unavailable: union of the last
``ceil(N/50)`` files (one wider than binding — weaker, never wrongly
red).
"""

import json
import re
import subprocess
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


def _dedupe_windows(files: list[Path]) -> list[Path]:
    """Collapse consecutive files with IDENTICAL key sets, keeping the
    newest of each run. A stalled round (r9: zero builder turns) makes
    the driver re-record the previous round's window verbatim; that
    duplicate carries no new coverage information, and counting it
    against the ``ceil(N/50)-1`` union width would make ANY rotation
    pigeonhole-impossible (two binding files, 50 distinct keys, N-50
    queries left outside). The revisit guarantee is therefore stated
    over DISTINCT driver windows."""
    out: list[Path] = []
    prev: frozenset[str] | None = None
    for p in files:
        keys = frozenset(json.loads(p.read_text()).keys())
        if keys == prev:
            out[-1] = p  # same window, newer file — keep the newest
        else:
            out.append(p)
        prev = keys
    return out


def _commit_time(path: Path) -> int | None:
    """Unix time of the last commit touching ``path`` (None if never
    committed or git unavailable)."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", str(path)],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
        s = out.stdout.strip()
        return int(s) if out.returncode == 0 and s else None
    except Exception:
        return None


def test_window_is_50_or_registry_smaller():
    order = _registry_order()
    assert len(order) == len(set(order)), "duplicate registry keys"
    # the rotation problem only exists with >WINDOW queries; if the
    # registry ever shrinks below it, every query is always checked
    if len(order) <= WINDOW:
        return


def test_no_query_rests_more_than_its_share_of_rounds():
    order = _registry_order()
    if len(order) <= WINDOW:
        return
    files = _correctness_files()
    assert files, "no CORRECTNESS_r*.json present — driver never ran?"
    # tightest achievable revisit period: ceil(N / WINDOW) rounds, so
    # a query may be absent from at most ceil(N/WINDOW) - 1 consecutive
    # driver windows. For N <= 2*WINDOW this is the strict single
    # -binding-file rule from r7.
    width = -(-len(order) // WINDOW) - 1
    reg_t = _commit_time(REPO / "__spark_entry__.py")
    if reg_t is None:
        # no git metadata: one file wider (weaker, never wrongly red)
        distinct = _dedupe_windows(files)
        binding_names = [p.name for p in distinct[-(width + 1) :]]
        covered: set[str] = set()
        for p in distinct[-(width + 1) :]:
            covered |= set(json.loads(p.read_text()).keys())
    else:
        known = [
            p
            for p in files
            if (t := _commit_time(p)) is not None and t <= reg_t
        ]
        if not known:
            return  # ordering predates every committed driver file
        binding = _dedupe_windows(known)[-width:]
        binding_names = [p.name for p in binding]
        covered = set()
        for p in binding:
            covered |= set(json.loads(p.read_text()).keys())
    window = set(order[:WINDOW])
    stale = [
        name
        for name in order
        if name not in covered and name not in window
    ]
    assert not stale, (
        f"registry queries absent from the newest {width} driver "
        f"window(s) the current ordering is accountable to "
        f"({binding_names}) AND outside the current first-{WINDOW}: "
        f"{stale} — move them to the front of _REGISTRY (every query "
        f"must get a driver row at least every ceil(N/{WINDOW}) "
        f"rounds; if this fired on a registry edit, rotate the window "
        f"in the same change)"
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
