"""Audit the queries() registry against the driver's 50-entry
correctness window.

The driver records only the first 50 entries of ``queries()`` per
round (CORRECTNESS_r*.json).  This tool verifies the ordering contract
(suite.py QUERIES comment): every oracle-backed entry must either sit
inside the window now or have a hash-green row in a previous round's
CORRECTNESS file; rows-only entries park at the end.

Usage: python tools/registry_audit.py [CORRECTNESS_r06.json ...]
(defaults to every CORRECTNESS_r*.json in the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

WINDOW = 50


def main() -> int:
    files = sys.argv[1:] or sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
    )
    seen: dict[str, str] = {}
    for f in files:
        label = os.path.basename(f)
        try:
            data = json.load(open(f))
        except Exception:
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                seen[name] = label
    q = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = set(q[:WINDOW])

    problems = []
    print(f"registry: {len(q)} entries ({len(oracles)} oracle-backed), window={WINDOW}")
    for name in q:
        in_win = name in window
        if name not in oracles:
            if in_win:
                print(f"  note: rows-only entry {name!r} occupies a window slot")
            continue
        if not in_win and name not in seen:
            problems.append(name)
    never = [n for n in q[:WINDOW] if n in oracles and n not in seen]
    prev_green = [n for n in q[:WINDOW] if n in oracles and n in seen]
    print(f"window: {len(never)} never-checked oracle entries inside (good), "
          f"{len(prev_green)} previously-green slots")
    if problems:
        print("PROBLEM: oracle-backed entries outside the window with NO prior "
              f"hash-green record: {problems}")
        return 1
    print("OK: every oracle-backed entry is window-covered or previously green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
