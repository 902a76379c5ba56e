"""Audit the queries() registry against the driver's 50-entry
correctness window.

The driver records only the first 50 entries of ``queries()`` per
round (CORRECTNESS_r*.json).  This tool verifies the ordering contract
(suite.py QUERIES comment): every oracle-backed entry must either sit
inside the window now or have a hash-green row in a previous round's
CORRECTNESS file; rows-only entries park at the end.

The audit is state-aware: the committed ordering is either *pre-run*
(the upcoming window has unrecorded entries — the driver has not yet
consumed it) or *post-run* (every oracle-backed window entry is green
in the latest CORRECTNESS file — the driver just ran, and the next
rotation has not been committed yet).  Freshness-limit entries outside
the window are an actionable WARNING pre-run (reorder before the
driver fires) but ARE the next rotation queue post-run — there they
are printed as the plan and only an infeasible queue (more must-rotate
entries than window slots) is a PROBLEM.

Usage: python tools/registry_audit.py [CORRECTNESS_r06.json ...]
(defaults to every CORRECTNESS_r*.json in the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import sys

WINDOW = 50


def load_records(files):
    """-> (latest_round, {entry: newest hash-green round}, {entry: label})."""
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
                if rnd >= seen_round.get(name, -1):
                    seen[name] = label
                seen_round[name] = max(seen_round.get(name, 0), rnd)
    return latest_round, seen_round, seen


def audit(q, oracles, holdback, holdback_since, latest_round, seen_round,
          window=WINDOW, out=print):
    """Pure audit core — returns the exit code; prints via ``out``.

    q: ordered entry names; oracles: oracle-backed names (holdbacks
    included by the caller); holdback/holdback_since: the declared
    withheld-oracle set and its declaration rounds; seen_round: newest
    hash-green round per entry (from load_records).
    """
    seen = set(seen_round)
    win = set(q[:window])
    out(f"registry: {len(q)} entries ({len(oracles)} oracle-backed incl. "
        f"{len(holdback)} held back), window={window}")
    for hb in sorted(holdback):
        since = holdback_since.get(hb)
        if since is None:
            out(f"PROBLEM: holdback {hb!r} has no ORACLE_HOLDBACK_SINCE "
                "round — declare when it was held back")
            return 1
        if since < latest_round and hb not in seen:
            # a FULL driver round has passed since declaration and the
            # oracle still is not published — the r10-advice failure tier
            out(f"PROBLEM: holdback {hb!r} (declared r{since:02d}) has "
                f"persisted past its declaration round (latest driver "
                f"round r{latest_round:02d}) with no hash-green record — "
                "publish its oracle with this rotation")
            return 1
        out(f"WARNING: {hb!r} holds back its oracle (declared "
            f"r{since:02d}) — it MUST publish with the next rotation")

    # r12 (advice): a holdback declared in the latest recorded round is
    # unpublished by definition — >= latest_round, not >, or the audit
    # fails one round earlier than the warn-then-fail lifecycle above
    def fresh_holdback(n: str) -> bool:
        return n in holdback and holdback_since.get(n, 0) >= latest_round

    problems = []
    for name in q:
        in_win = name in win
        if name not in oracles:
            if in_win:
                out(f"  note: rows-only entry {name!r} occupies a window slot")
            continue
        if not in_win and name not in seen and not fresh_holdback(name):
            problems.append(name)
    never = [n for n in q[:window] if n in oracles and n not in seen]
    prev_green = [n for n in q[:window] if n in oracles and n in seen]
    out(f"window: {len(never)} never-checked oracle entries inside (good), "
        f"{len(prev_green)} previously-green slots")
    if problems:
        out("PROBLEM: oracle-backed entries outside the window with NO prior "
            f"hash-green record: {problems}")
        return 1

    # --- freshness ledger (r12, verdict ask #7) -----------------------
    # one line per record age so the 50 x 3-round horizon is inspectable
    # at a glance; the hard gate below enforces it
    hist: dict[int, int] = {}
    for n in q:
        if n in oracles:
            r = seen_round.get(n, 0)
            hist[r] = hist.get(r, 0) + 1
    ledger = " ".join(
        (f"r{r:02d}:{c}" if r else f"never:{c}") for r, c in sorted(hist.items())
    )
    oldest = min((r for r in hist if r), default=0)
    tail = f" — oldest recorded = r{oldest:02d}" if oldest else ""
    out(f"freshness ledger (newest hash-green record per entry): {ledger}{tail}")

    # freshness contract (amended r09): an entry OUTSIDE the upcoming
    # window will not be refreshed this round, so its newest record must
    # be at most THREE rounds old by the time this round's driver run
    # lands.  Three, not two, by capacity: the registry carries ~145
    # oracle-backed entries against a 50-slot window, so a 2-round
    # horizon (2 x 50 = 100 slot-rounds) is structurally infeasible,
    # while 3 rounds (150) covers the registry with headroom.
    stale_limit = latest_round - 2  # next run is latest_round + 1
    stale = sorted(
        (n, seen_round.get(n, 0))
        for n in q[window:]
        if n in oracles and seen_round.get(n, 0) < stale_limit
        and not fresh_holdback(n)
    )
    if stale:
        out("PROBLEM: oracle-backed entries outside the window whose newest "
            f"driver record predates r{stale_limit:02d} (would exceed the "
            f"three-round freshness limit): {stale}")
        return 1

    # entries AT the limit must be in the very next window.  Whether
    # that is an alarm depends on which state the ordering is in:
    # post-run (every oracle-backed window entry green in the latest
    # round — the driver just consumed this ordering) the at-limit set
    # simply IS the committed next-window queue, so it prints as the
    # plan and only infeasibility fails; pre-run (the window head still
    # has unrecorded entries) an at-limit entry outside the window will
    # breach the freshness gate after the upcoming run — loud WARNING,
    # reorder before the driver fires.
    win_oracle = [n for n in q[:window] if n in oracles]
    post_run = bool(win_oracle) and all(
        seen_round.get(n, 0) == latest_round for n in win_oracle
    )
    aged = sorted(n for n in q[window:] if n in oracles
                  and seen_round.get(n, 0) == stale_limit)
    if aged and not post_run:
        out(f"WARNING: {len(aged)} outside-window entries at the "
            f"three-round freshness limit (r{stale_limit:02d} records) — "
            f"they MUST head the next window: {aged}")

    # --- capacity + rotation plan (r11, verdict ask #1) ---------------
    n_oracle = sum(1 for n in q if n in oracles)
    headroom = 3 * window - n_oracle
    if headroom < 0:
        out(f"PROBLEM: {n_oracle} oracle-backed entries exceed the "
            f"{3 * window}-slot-round freshness horizon — retire/merge "
            "entries before adding more")
        return 1
    out(f"capacity: {n_oracle} oracle-backed vs {3 * window} slot-rounds "
        f"-> {headroom} free slot-rounds of headroom")
    if headroom < 5:
        out(f"WARNING: headroom {headroom} < 5 — retire/merge before the "
            "next batch of oracle-backed entries")
    nxt = latest_round + 1
    n_hold = len(holdback)
    if post_run:
        # the at-limit set is the next window's must-rotate head
        must1 = aged
        free1 = window - len(must1) - n_hold
        hold_part = f" + {n_hold} promoted holdbacks" if n_hold else ""
        out(f"rotation plan: r{nxt:02d} window = {len(must1)} must-rotate "
            f"(r{stale_limit:02d}-recorded){hold_part} + {free1} free")
        if free1 < 0:
            out("PROBLEM: the next must-rotate set exceeds the window — the "
                "schedule is infeasible; retire entries or refresh early")
            return 1
    must2 = sorted(n for n in q if n in oracles
                   and seen_round.get(n, 0) == stale_limit + 1
                   and n not in win)
    must3 = sorted(n for n in q if n in oracles
                   and seen_round.get(n, 0) == stale_limit + 2
                   and n not in win and n not in must2)
    out(f"rotation plan: r{nxt + 1:02d} window = {len(must2)} must-rotate "
        f"(r{stale_limit + 1:02d}-recorded) + {window - len(must2)} free; "
        f"r{nxt + 2:02d} window = {len(must3)} must-rotate "
        f"(r{stale_limit + 2:02d}-recorded) + {window - len(must3)} free")
    if len(must2) > window or len(must3) > window:
        out("PROBLEM: a future must-rotate set exceeds the window — the "
            "schedule is infeasible; retire entries or refresh early")
        return 1
    out("OK: every oracle-backed entry is window-covered or previously green")
    return 0


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entrymod

    files = sys.argv[1:] or sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))
    )
    latest_round, seen_round, _ = load_records(files)
    q = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    # r10 advice: held-back oracles are oracle-backed entries hiding
    # from the driver — the audit must see them, or they silently
    # escape the window-coverage and freshness contracts forever
    from matcha_spark.suite import ORACLE_HOLDBACK, ORACLE_HOLDBACK_SINCE

    oracles |= set(ORACLE_HOLDBACK)
    return audit(q, oracles, ORACLE_HOLDBACK, ORACLE_HOLDBACK_SINCE,
                 latest_round, seen_round)


if __name__ == "__main__":
    sys.exit(main())
