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
    seen_round: dict[str, int] = {}
    latest_round = 0
    for f in files:
        label = os.path.basename(f)
        try:
            data = json.load(open(f))
        except Exception:
            continue
        try:
            rnd = int(label.split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            rnd = 0
        latest_round = max(latest_round, rnd)
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                seen[name] = label
                seen_round[name] = max(seen_round.get(name, 0), rnd)
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
    # freshness contract (amended r09): an entry OUTSIDE the upcoming
    # window will not be refreshed this round, so its newest record must
    # be at most THREE rounds old by the time this round's driver run
    # lands.  Three, not two, by capacity: the registry now carries 109
    # oracle-backed entries against a 50-slot window, so a 2-round
    # horizon (2 x 50 = 100 slot-rounds) is structurally infeasible,
    # while 3 rounds (150) covers the registry with headroom for new
    # entries and rows-only rotation (the r08->r09 judge window also
    # spent 8 slots giving never-checked rows-only entries a driver
    # record).  Steady state: ~37+ refreshes per round keeps every entry
    # inside the horizon.
    stale_limit = latest_round - 2  # next run is latest_round + 1
    stale = sorted(
        (n, seen_round[n])
        for n in q[WINDOW:]
        if n in oracles and seen_round.get(n, 0) < stale_limit
    )
    if stale:
        print("PROBLEM: oracle-backed entries outside the window whose newest "
              f"driver record predates r{stale_limit:02d} (would exceed the "
              f"three-round freshness limit): {stale}")
        return 1
    # ADVICE r10: the original two-round freshness bound stays as a
    # WARNING tier — the hard gate above allows three rounds only by
    # window-capacity arithmetic, and anything that old should be at
    # the very front of the rotation, loudly
    aged = sorted(n for n in q[WINDOW:] if n in oracles
                  and seen_round.get(n, 0) == stale_limit)
    if aged:
        print(f"WARNING: {len(aged)} outside-window entries at the "
              f"three-round freshness limit (r{stale_limit:02d} records) — "
              f"they MUST rotate into the next window: {aged}")
    two_round = sorted(n for n in q[WINDOW:] if n in oracles
                       and seen_round.get(n, 0) == stale_limit + 1)
    if two_round:
        print(f"note: {len(two_round)} outside-window entries will be two "
              f"rounds stale after the upcoming run (r{stale_limit + 1:02d} "
              f"records) — next rotation queue: {two_round}")
    print("OK: every oracle-backed entry is window-covered or previously green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
