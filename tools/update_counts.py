"""Regenerate the query-count claims in README.md / ARCHITECTURE.md from
the live ``__spark_entry__`` contract — one source of truth, never
hand-synced (tests/test_doc_counts.py fails on drift).

Usage: python tools/update_counts.py [--check]
  --check: exit 1 if the docs are stale instead of rewriting them.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def live_counts() -> tuple[int, int, list[str]]:
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    rows_only = sorted(set(q) - set(o))
    return len(q), len(o), rows_only


def rendered(n_queries: int, n_oracles: int, rows_only: list[str]) -> dict[str, list[tuple[str, str]]]:
    """(pattern, replacement) rewrites per file."""
    ro = ", ".join(f"`{name}`" for name in rows_only)
    return {
        "README.md": [
            (
                r"(`__spark_entry__\.py` — )\d+( named queries)",
                rf"\g<1>{n_queries}\g<2>",
            ),
        ],
        "ARCHITECTURE.md": [
            (
                r"exposes \d+ named queries, \d+ paired with a DuckDB\n"
                r"oracle \(rows-only, not SQL-expressible:[^)]*\)",
                f"exposes {n_queries} named queries, {n_oracles} paired "
                f"with a DuckDB\noracle (rows-only, not SQL-expressible: "
                f"{ro})",
            ),
        ],
    }


def main() -> int:
    check = "--check" in sys.argv
    n_q, n_o, rows_only = live_counts()
    stale = []
    for fname, rules in rendered(n_q, n_o, rows_only).items():
        path = os.path.join(REPO, fname)
        with open(path) as f:
            text = f.read()
        new = text
        for pattern, repl in rules:
            new, n_sub = re.subn(pattern, repl, new)
            if n_sub == 0:
                print(f"WARN: pattern not found in {fname}: {pattern!r}")
                return 2
        if new != text:
            stale.append(fname)
            if not check:
                with open(path, "w") as f:
                    f.write(new)
    if stale:
        verb = "stale" if check else "updated"
        print(f"{verb}: {', '.join(stale)} (queries={n_q}, oracles={n_o})")
        return 1 if check else 0
    print(f"docs in sync (queries={n_q}, oracles={n_o}, rows_only={rows_only})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
