"""Physical-plan inspection helpers — the engineering loop for scale.

`explain("formatted")` as data: assert that a plan reads only the
columns it needs (pruning), pushes its filters into the scan, and
doesn't shuffle more than expected. Used by tests/test_plans.py to
keep the 100 TB properties from regressing as operators evolve.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan (AQE may
    remove some at runtime; this is the static upper bound)."""
    plan = explain_str(df)
    # formatted mode prints each node once in the tree and once in the
    # details ("(4) Exchange") — count detail headers only
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    if n == 0:
        n = len(re.findall(r"\bExchange\b", plan))
    return n


def scanned_columns(df: DataFrame, table_hint: str | None = None) -> set[str]:
    """Columns in the parquet scan's ReadSchema (union over scans)."""
    plan = explain_str(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def assert_column_pruning(
    df: DataFrame, allowed: set[str], table_hint: str | None = None
) -> None:
    got = scanned_columns(df, table_hint)
    extra = got - allowed
    if extra:
        raise AssertionError(
            f"scan reads unexpected columns {sorted(extra)}; allowed {sorted(allowed)}"
        )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = explain_str(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    return bool(m and m.group(1).strip())
