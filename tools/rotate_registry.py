"""Mechanically reorder the `_REGISTRY` dict in __spark_entry__.py.

The driver checks only the FIRST 50 registry entries each round, so the
window must rotate (tests/test_rotation.py). Hand-reordering a ~300-line
dict literal is error-prone; this tool does it with ast-located source
segments so the entry bodies are moved verbatim.

Usage:
    python tools/rotate_registry.py name1 name2 ...   # names to move
                                                      # to the FRONT,
                                                      # in this order
The remaining entries keep their current relative order after the
front block. The leading comment block (ROTATION POLICY) is preserved.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__spark_entry__.py"


def main(front: list[str]) -> None:
    src = ENTRY.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    reg = None
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(
            node.target, "id", None
        ) == "_REGISTRY":
            reg = node.value
            break
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "_REGISTRY" for t in node.targets
        ):
            reg = node.value
            break
    assert isinstance(reg, ast.Dict), "_REGISTRY dict literal not found"

    # Source segment for each entry: from the END of the previous
    # entry to this value's end line — interior comment blocks between
    # entries (e.g. the per-round window markers) travel WITH the
    # entry they precede instead of being silently deleted (r12
    # self-review finding).
    entries: dict[str, str] = {}
    order: list[str] = []
    first_key_line = None
    prev_end = None
    commented: list[str] = []
    for k, v in zip(reg.keys, reg.values):
        name = ast.literal_eval(k)
        if first_key_line is None:
            first_key_line = k.lineno
            prev_end = k.lineno - 1
        seg = "".join(lines[prev_end : v.end_lineno])
        if prev_end < k.lineno - 1:  # comment lines ride with `name`
            commented.append(name)
        prev_end = v.end_lineno
        entries[name] = seg
        order.append(name)
    # comments after the last entry, before the closing brace
    tail = "".join(lines[prev_end : reg.end_lineno - 1])

    missing = [n for n in front if n not in entries]
    assert not missing, f"unknown registry names: {missing}"
    rest = [n for n in order if n not in set(front)]
    new_order = list(front) + rest
    # only warn for comment-carrying entries whose POSITION changed —
    # a stationary entry's comments still describe the right place
    moved_comments = [
        n for n in commented
        if new_order.index(n) != order.index(n)
    ]

    # Preamble = dict-open line(s) + leading comment block, i.e.
    # everything from the dict's start line up to the first key line.
    pre = "".join(lines[reg.lineno - 1 : first_key_line - 1])
    body = "".join(entries[n] for n in new_order)
    post = "".join(lines[reg.end_lineno - 1 : reg.end_lineno])  # "}\n"
    new_src = (
        "".join(lines[: reg.lineno - 1]) + pre + body + tail + post
        + "".join(lines[reg.end_lineno :])
    )
    ENTRY.write_text(new_src)

    # sanity: reparse, same key multiset, new order
    tree2 = ast.parse(new_src)
    for node in ast.walk(tree2):
        if isinstance(node, ast.AnnAssign) and getattr(
            node.target, "id", None
        ) == "_REGISTRY":
            keys2 = [ast.literal_eval(k) for k in node.value.keys]
            assert keys2 == new_order, "rotation produced wrong order"
            print(f"rotated: {len(front)} to front, {len(keys2)} total")
            if moved_comments:
                # comments travel with the entry they precede, so
                # position-specific markers ("positions 48-50 …") can
                # land at the wrong position after a rotation — flag
                # them for a manual pass instead of silently moving on
                print(
                    "REVIEW interior comments riding with: "
                    + ", ".join(moved_comments)
                )
            return
    raise AssertionError("reparse failed")


if __name__ == "__main__":
    main(sys.argv[1:])
