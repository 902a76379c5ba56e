"""A tiny pure-Python model of the reference's query semantics, used as
a differential-testing oracle for the Spark engine.

Implements the observable behavior of ``solve*`` + select's regroup
(reference src:252-261, 374-412) directly over Python lists — unification
by backtracking, conde-style optional branches, membero values — with no
Spark involvement.  Comparisons must be set-based and marker-blind.
"""

from __future__ import annotations

from itertools import product

from matcha_spark.patterns import Exists, Minus, NotExists, Optional, Values, find_vars, is_var, var_name

UNBOUND = "<unbound>"


def _match(triple, pattern, binding):
    b = dict(binding)
    for val, pat in zip(triple, pattern):
        if is_var(pat):
            v = var_name(pat)
            if v in b:
                if b[v] != val:
                    return None
            else:
                b[v] = val
        elif pat != val:
            return None
    return b


def _solve(db, patterns, binding):
    """All bindings extending ``binding`` that satisfy ``patterns``
    (conde semantics for optionals, reference src:193-203)."""
    triples = [
        p
        for p in patterns
        if not isinstance(p, (Optional, Values, NotExists, Exists, Minus))
    ]
    values = [p for p in patterns if isinstance(p, Values)]
    optionals = [p for p in patterns if isinstance(p, Optional)]
    negations = [p for p in patterns if isinstance(p, (NotExists, Exists, Minus))]

    bindings = [dict(binding)]
    for pat in triples:
        bindings = [b2 for b in bindings for t in db if (b2 := _match(t, pat, b)) is not None]
    for vc in values:
        v = var_name(vc.var)
        coll = list(vc.coll) if vc.coll is not None else []
        out = []
        for b in bindings:
            if v in b:
                out.extend(b for x in coll if x == b[v])
            else:
                out.extend({**b, v: x} for x in coll)
        bindings = out
    for neg in negations:
        # engine semantics: the block solves independently, then a
        # semi/anti-join on (block vars ∩ bound vars); an uncorrelated
        # NOT EXISTS / EXISTS gates on whether the block matches at all,
        # an uncorrelated MINUS removes nothing (dom-disjoint rule)
        block_sols = _solve(db, list(neg.patterns), {})
        bvars = set(find_vars(list(neg.patterns)))

        def keep(b):
            shared = [v for v in bvars if v in b]
            if shared:
                matched = any(
                    all(bs.get(v) == b[v] for v in shared) for bs in block_sols
                )
            elif isinstance(neg, Minus):
                return True
            else:
                matched = bool(block_sols)
            return matched if isinstance(neg, Exists) else not matched

        bindings = [b for b in bindings if keep(b)]

    if not optionals:
        return bindings

    has_required = bool(triples or values)
    result = []
    for b in bindings:
        for opt in optionals:
            result.extend(_solve(db, opt.patterns, b))
        if has_required:
            result.append(b)  # the succeed branch
    return result


def model_select(pvars, patterns, db):
    """Reference select: solve, then regroup by required projected vars
    with per-optional-var column collection and cartesian emit."""
    db = list(dict.fromkeys(tuple(t) for t in db))  # pldb set semantics
    pvars = [var_name(v) for v in pvars]
    sols = _solve(db, patterns, {})

    def mandatory():
        req = [
            p
            for p in patterns
            if not isinstance(p, (Optional, NotExists, Exists, Minus))
        ]
        out = set()
        for p in req:
            if isinstance(p, Values):
                out.add(var_name(p.var))
            else:
                out.update(var_name(e) for e in p if is_var(e))
        return out

    mand = mandatory()
    req_proj = [v for v in pvars if v in mand]
    opt_proj = [v for v in pvars if v not in mand]

    groups: dict[tuple, list[dict]] = {}
    for s in sols:
        key = tuple(_freeze(s.get(v)) for v in req_proj)
        groups.setdefault(key, []).append(s)

    rows = set()
    for key, group in groups.items():
        cols = []
        for v in opt_proj:
            vals = [_freeze(s[v]) for s in group if v in s]
            cols.append(sorted(set(vals), key=repr) if vals else [UNBOUND])
        for combo in product(*cols):
            row = dict(zip(req_proj, key))
            row.update(zip(opt_proj, combo))
            rows.add(tuple(row[v] for v in pvars))
    return rows


def _freeze(x):
    return x


def model_build(subject_var, template, patterns, db):
    """Reference build pipeline (src:580-627): solve → binding maps →
    instantiate {subject_key: subject} ∪ template → drop unbound keys →
    group by subject → merge into sets → flatten singletons."""
    from matcha_spark.patterns import find_vars

    db = list(dict.fromkeys(tuple(t) for t in db))
    sv = var_name(subject_var)
    tvars = [var_name(v) for v in template.values() if is_var(v)]
    sols = _solve(db, patterns, {})

    maps = []
    for s in sols:
        if sv not in s:
            continue  # unbound subject → dropped group
        m = {"__subject": s[sv]}
        for k, v in template.items():
            val = s.get(var_name(v), UNBOUND) if is_var(v) else v
            if val is not UNBOUND:
                m[k] = val
        maps.append(m)
    # dedupe instantiated maps
    seen, deduped = set(), []
    for m in maps:
        f = tuple(sorted(m.items(), key=repr))
        if f not in seen:
            seen.add(f)
            deduped.append(m)
    groups: dict = {}
    for m in deduped:
        acc = groups.setdefault(m["__subject"], {})
        for k, v in m.items():
            if k == "__subject":
                continue
            acc.setdefault(k, [])
            if v not in acc[k]:
                acc[k].append(v)
    out = set()
    for subj, acc in groups.items():
        items = [("__subject", subj)]
        for k, vals in acc.items():
            items.append((k, vals[0] if len(vals) == 1 else frozenset(vals)))
        out.add(frozenset(items))
    return out


def model_select_bag(pvars, patterns, db):
    """Bag-semantics reference select: one output row per derivation
    (the reference's ``run*`` enumeration keeps duplicates,
    ``src:252-261``; its regroup collects optional values without
    distinct, ``src:374-412``).  Returns a multiset as a sorted list."""
    db = list(dict.fromkeys(tuple(t) for t in db))  # pldb set semantics
    pvars = [var_name(v) for v in pvars]
    sols = _solve(db, patterns, {})

    req = [
        p
        for p in patterns
        if not isinstance(p, (Optional, NotExists, Exists, Minus))
    ]
    mand = set()
    for p in req:
        if isinstance(p, Values):
            mand.add(var_name(p.var))
        else:
            mand.update(var_name(e) for e in p if is_var(e))
    req_proj = [v for v in pvars if v in mand]
    opt_proj = [v for v in pvars if v not in mand]

    if not opt_proj:
        rows = [tuple(_freeze(s.get(v)) for v in pvars) for s in sols]
        return sorted(rows, key=repr)

    groups: dict[tuple, list[dict]] = {}
    for s in sols:
        key = tuple(_freeze(s.get(v)) for v in req_proj)
        groups.setdefault(key, []).append(s)

    rows = []
    for key, group in groups.items():
        cols = []
        for v in opt_proj:
            vals = [_freeze(s[v]) for s in group if v in s]
            cols.append(sorted(vals, key=repr) if vals else [UNBOUND])
        for combo in product(*cols):
            row = dict(zip(req_proj, key))
            row.update(zip(opt_proj, combo))
            rows.append(tuple(row[v] for v in pvars))
    return sorted(rows, key=repr)
