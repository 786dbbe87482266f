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


def test_bench_only_queries_prefixed():
    # the auto-append picks up bench_* names only; anything else in
    # bench_only_queries() would never be benched
    import __spark_entry__ as entry

    bad = [n for n in entry.bench_only_queries() if not n.startswith("bench_")]
    assert not bad, f"bench-only entries missing the bench_ prefix: {bad}"
