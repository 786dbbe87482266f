"""bench.py contract checks (no Spark session — import-level only).

bench.py silently skips HEADLINE names missing from the registry
(`n for n in HEADLINE if n in qs`) — right for forward-compat when a
query is renamed mid-round, wrong as a permanent state: a typo would
quietly shrink the benchmark. This pins every name to a real query."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_headline_names_all_resolve():
    import bench
    import __spark_entry__ as entry

    known = set(entry.queries()) | set(entry.bench_only_queries())
    missing = [n for n in bench.HEADLINE if n not in known]
    assert not missing, f"bench HEADLINE names not in the registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate rows"


def test_final_line_stays_under_driver_tail_capture():
    """The driver tail-captures ~2000 bytes of stdout and JSON-parses
    the last line. r7's line carried 65 per-query timings and outgrew
    the capture (BENCH_r07 parsed:null). The final line is now
    fixed-width: even at 500 queries it must stay well under the cap,
    and it must parse with the headline total intact."""
    import json

    import bench

    timings = {f"query_name_{i:03d}": 1.2345 for i in range(500)}
    builds = {f"index_{i}": 9.87 for i in range(20)}
    line = bench.final_line(timings, builds, builds, 0.1)
    assert len(line) < 1500, f"{len(line)}B final line"
    parsed = json.loads(line)
    assert parsed["value"] == round(500 * 1.2345, 4)
    assert parsed["n_queries"] == 500
    assert parsed["unit"] == "sec"
    # negative sentinel build entries (prepare failure) are excluded
    # from totals rather than poisoning them
    line2 = bench.final_line({"q": 1.0}, {"error": -1.0}, {}, 0.1)
    assert json.loads(line2)["build_total_s"] == 0


def test_bench_only_queries_prefixed():
    # the auto-append picks up bench_* names only; anything else in
    # bench_only_queries() would never be benched
    import __spark_entry__ as entry

    bad = [n for n in entry.bench_only_queries() if not n.startswith("bench_")]
    assert not bad, f"bench-only entries missing the bench_ prefix: {bad}"
