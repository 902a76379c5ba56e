"""Lifecycle fixtures for tools/registry_audit.py (r12, advice item).

The audit is pure given (ordering, oracle set, holdbacks, records) —
these fixtures pin the holdback warn-then-fail tiers (including the
since == latest_round off-by-one the r11 advice flagged), the
window-coverage gate, the three-round freshness gate, and the
pre-run/post-run handling of at-limit entries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from registry_audit import audit  # noqa: E402


def run(q, oracles, holdback=None, since=None, latest=11, seen=None, window=4):
    lines = []
    code = audit(
        list(q),
        set(oracles),
        set(holdback or ()),
        dict(since or {}),
        latest,
        dict(seen or {}),
        window=window,
        out=lines.append,
    )
    return code, "\n".join(lines)


def test_holdback_declared_latest_round_warns_not_fails():
    # the r11 advice fixture: 4 holdbacks declared in the latest
    # recorded round must WARN (they publish next rotation), not fail —
    # neither via the lifecycle tier nor via window coverage
    q = ["a", "b", "c", "d", "hb"]
    code, out = run(
        q, {"a", "b", "c", "d", "hb"},
        holdback={"hb"}, since={"hb": 11}, latest=11,
        seen={"a": 11, "b": 11, "c": 11, "d": 11},
    )
    assert code == 0, out
    assert "WARNING: 'hb' holds back" in out
    assert "PROBLEM" not in out


def test_holdback_persisting_past_declaration_fails():
    q = ["a", "b", "c", "d", "hb"]
    code, out = run(
        q, {"a", "b", "c", "d", "hb"},
        holdback={"hb"}, since={"hb": 10}, latest=11,
        seen={"a": 11, "b": 11, "c": 11, "d": 11},
    )
    assert code == 1
    assert "persisted past its declaration round" in out


def test_holdback_without_since_round_fails():
    code, out = run(["hb"], {"hb"}, holdback={"hb"}, since={}, latest=11)
    assert code == 1 and "no ORACLE_HOLDBACK_SINCE" in out


def test_unrecorded_entry_outside_window_fails():
    q = ["a", "b", "c", "d", "e"]
    code, out = run(
        q, set(q), seen={"a": 11, "b": 11, "c": 11, "d": 11}, latest=11
    )
    assert code == 1
    assert "NO prior hash-green record: ['e']" in out


def test_stale_entry_outside_window_fails():
    q = ["a", "b", "c", "d", "e"]
    code, out = run(
        q, set(q),
        seen={"a": 11, "b": 11, "c": 11, "d": 11, "e": 8}, latest=11,
    )
    assert code == 1
    assert "three-round freshness limit" in out and "'e'" in out


def test_at_limit_entries_post_run_are_the_rotation_queue():
    # the window was just recorded (all green in the latest round):
    # at-limit entries are the committed next-window head — printed as
    # the plan, not warned about
    q = ["a", "b", "c", "d", "e", "f"]
    code, out = run(
        q, set(q),
        seen={"a": 11, "b": 11, "c": 11, "d": 11, "e": 9, "f": 10},
        latest=11,
    )
    assert code == 0, out
    assert "WARNING" not in out
    assert "rotation plan: r12 window = 1 must-rotate (r09-recorded)" in out


def test_at_limit_entries_pre_run_warn():
    # the ordering has unrecorded window entries (pre-run): an at-limit
    # entry outside the window will breach freshness after the run
    q = ["new1", "b", "c", "d", "e", "f"]
    code, out = run(
        q, set(q),
        seen={"b": 11, "c": 11, "d": 11, "e": 9, "f": 10},
        latest=11,
    )
    assert code == 0, out
    assert "MUST head the next window: ['e']" in out


def test_infeasible_rotation_queue_fails_post_run():
    # more at-limit entries than window slots: no feasible next window
    q = ["a", "b", "e1", "e2", "e3"]
    code, out = run(
        q, set(q),
        seen={"a": 11, "b": 11, "e1": 9, "e2": 9, "e3": 9},
        latest=11, window=2,
    )
    assert code == 1
    assert "infeasible" in out


def test_capacity_overflow_fails():
    q = [f"e{i}" for i in range(7)]
    seen = {f"e{i}": 11 for i in range(7)}
    code, out = run(q, set(q), seen=seen, latest=11, window=2)
    assert code == 1
    assert "exceed" in out and "freshness horizon" in out


def test_plan_audit_detectors():
    """tools/plan_audit.py string detectors on synthetic plan text (the
    live tool is integration-level; these pin the matching rules)."""
    import plan_audit as PA

    good = (
        "(1) Scan parquet\n"
        "PushedFilters: [IsNotNull(x), GreaterThan(x,1)]\n"
        "ReadSchema: struct<x:double,y:double>\n"
        "(2) HashAggregate [codegen id : 1]\n"
    )
    PA.EXPECT["__t"] = {"pushed", "codegen", "pruned:z"}
    try:
        assert PA.audit_entry("__t", good) == []
        bad = good.replace("[IsNotNull(x), GreaterThan(x,1)]", "[]")
        assert any("PushedFilters" in p for p in PA.audit_entry("__t", bad))
        bad = good.replace(" [codegen id : 1]", "")
        assert any("WholeStageCodegen" in p for p in PA.audit_entry("__t", bad))
        bad = good.replace("struct<x:double,y:double>", "struct<x:double,z:int>")
        assert any("pruned" in p for p in PA.audit_entry("__t", bad))
        bad = good + "\n(3) CartesianProduct\n"
        assert any("cartesian" in p for p in PA.audit_entry("__t", bad))
    finally:
        del PA.EXPECT["__t"]
