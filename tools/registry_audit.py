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
    # r10 advice: held-back oracles are oracle-backed entries hiding
    # from the driver — the audit must see them, or they silently
    # escape the window-coverage and freshness contracts forever
    from matcha_spark.suite import ORACLE_HOLDBACK, ORACLE_HOLDBACK_SINCE

    oracles |= set(ORACLE_HOLDBACK)
    window = set(q[:WINDOW])

    problems = []
    print(f"registry: {len(q)} entries ({len(oracles)} oracle-backed incl. "
          f"{len(ORACLE_HOLDBACK)} held back), window={WINDOW}")
    for hb in sorted(ORACLE_HOLDBACK):
        since = ORACLE_HOLDBACK_SINCE.get(hb)
        if since is None:
            print(f"PROBLEM: holdback {hb!r} has no ORACLE_HOLDBACK_SINCE "
                  "round — declare when it was held back")
            return 1
        if since < latest_round and hb not in seen:
            # a FULL driver round has passed since declaration and the
            # oracle still is not published — the r10-advice failure tier
            print(f"PROBLEM: holdback {hb!r} (declared r{since:02d}) has "
                  f"persisted past its declaration round (latest driver "
                  f"round r{latest_round:02d}) with no hash-green record — "
                  "publish its oracle with this rotation")
            return 1
        print(f"WARNING: {hb!r} holds back its oracle (declared "
              f"r{since:02d}) — it MUST publish with the next rotation")
    for name in q:
        in_win = name in window
        if name not in oracles:
            if in_win:
                print(f"  note: rows-only entry {name!r} occupies a window slot")
            continue
        if not in_win and name not in seen:
            if (name in ORACLE_HOLDBACK
                    and ORACLE_HOLDBACK_SINCE.get(name, 0) > latest_round):
                # declared THIS round: the oracle is unpublished by
                # definition, so no prior record is expected — the
                # holdback warn/fail tier above owns its lifecycle
                continue
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

    def fresh_holdback(n: str) -> bool:
        return (n in ORACLE_HOLDBACK
                and ORACLE_HOLDBACK_SINCE.get(n, 0) > latest_round)

    stale = sorted(
        (n, seen_round.get(n, 0))
        for n in q[WINDOW:]
        if n in oracles and seen_round.get(n, 0) < stale_limit
        and not fresh_holdback(n)
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
    # --- capacity + rotation plan (r11, verdict ask #1) ---------------
    # the freshness horizon affords 3 x WINDOW slot-rounds; everything
    # beyond the oracle-backed count is headroom for new entries.  The
    # plan below is the schedule the ordering contract implies: each
    # upcoming round's window = that round's must-rotate set, padded
    # with the stalest early refreshes.
    n_oracle = sum(1 for n in q if n in oracles)
    headroom = 3 * WINDOW - n_oracle
    if headroom < 0:
        print(f"PROBLEM: {n_oracle} oracle-backed entries exceed the "
              f"{3 * WINDOW}-slot-round freshness horizon — retire/merge "
              "entries before adding more")
        return 1
    nxt = latest_round + 1
    must2 = sorted(n for n in q if n in oracles
                   and seen_round.get(n, 0) == stale_limit + 1
                   and n not in window)
    must3 = sorted(n for n in q if n in oracles
                   and seen_round.get(n, 0) == stale_limit + 2
                   and n not in window and n not in must2)
    print(f"capacity: {n_oracle} oracle-backed vs {3 * WINDOW} slot-rounds "
          f"-> {headroom} free slot-rounds of headroom")
    if headroom < 5:
        print(f"WARNING: headroom {headroom} < 5 — retire/merge before the "
              "next batch of oracle-backed entries")
    # declared holdbacks are pre-committed to the NEXT window's free
    # slots (they MUST publish with the next rotation), so print them
    # out of the free count rather than leaving them implicit
    n_hold = len(ORACLE_HOLDBACK)
    free2 = WINDOW - len(must2) - n_hold
    hold_part = f" + {n_hold} promoted holdbacks" if n_hold else ""
    print(f"rotation plan: r{nxt + 1:02d} window = {len(must2)} must-rotate "
          f"(r{stale_limit + 1:02d}-recorded){hold_part} + {free2} free; "
          f"r{nxt + 2:02d} window = {len(must3)} must-rotate "
          f"(r{stale_limit + 2:02d}-recorded) + {WINDOW - len(must3)} free")
    if len(must2) + n_hold > WINDOW or len(must3) > WINDOW:
        print("PROBLEM: a future must-rotate set exceeds the window — the "
              "schedule is infeasible; retire entries or refresh early")
        return 1
    print("OK: every oracle-backed entry is window-covered or previously green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
