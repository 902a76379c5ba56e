"""Differential testing: random BGP queries, Spark engine vs the pure
Python model of the reference semantics (tests/model.py)."""

import random

import pytest

from matcha_spark import Optional, TriplesDB, Unbound, Values, select

from .model import UNBOUND, model_select

POOL = [None, 0, 1, "x", "y"] + [f"k{i}" for i in range(4)]
PREDS = ["p", "q", "r"]
VARS = ["?a", "?b", "?c", "?d"]


def _rand_db(rng, n):
    return [
        (rng.choice(POOL), rng.choice(PREDS), rng.choice(POOL)) for _ in range(n)
    ]


def _rand_pattern(rng, allow_var=0.55):
    def elem(pool):
        return rng.choice(VARS) if rng.random() < allow_var else rng.choice(pool)

    return (elem(POOL), elem(PREDS), elem(POOL))


def _rand_patterns(rng, depth=0):
    pats = [_rand_pattern(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.5:
        pats.append(Values(rng.choice(VARS), [rng.choice(POOL) for _ in range(rng.randint(0, 3))]))
    if depth < 1:
        for _ in range(rng.randint(0, 2)):
            pats.append(Optional(_rand_patterns(rng, depth + 1)))
    return pats


def _blind(rows):
    out = set()
    for r in rows:
        out.add(tuple(UNBOUND if isinstance(v, Unbound) or v == UNBOUND else v for v in r))
    return out


SEEDS = list(range(40))


@pytest.mark.parametrize("seed", SEEDS)
def test_random_bgp_matches_model(spark, seed):
    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(0, 10))
    patterns = _rand_patterns(rng)
    from matcha_spark.patterns import find_vars

    allv = find_vars(patterns)
    if not allv:
        pytest.skip("no vars generated")
    rng.shuffle(allv)
    pvars = allv[: rng.randint(1, len(allv))]

    expected = _blind(model_select(pvars, patterns, db_rows))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, patterns, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={patterns}\npvars={pvars}"
    )


BUILD_SEEDS = list(range(100, 125))


@pytest.mark.parametrize("seed", BUILD_SEEDS)
def test_random_build_matches_model(spark, seed):
    from matcha_spark import GRAFTER_URI, build

    from .model import model_build

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(1, 10))
    patterns = _rand_patterns(rng)
    from matcha_spark.patterns import find_vars

    allv = find_vars(patterns)
    if not allv:
        pytest.skip("no vars generated")
    subject = allv[0]
    tvars = allv[1:] or allv
    template = {f"key{i}": v for i, v in enumerate(tvars[:3])}

    expected = model_build(subject, template, patterns, db_rows)

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = build(subject, template, patterns, db) or []
    finally:
        db.unpersist()
    got_norm = set()
    for m in got:
        items = []
        for k, v in m.items():
            key = "__subject" if k == GRAFTER_URI else k
            val = frozenset(v) if isinstance(v, (set, frozenset)) else v
            items.append((key, val))
        got_norm.add(frozenset(items))
    assert got_norm == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={patterns}\nsubject={subject}\ntemplate={template}"
    )


CONSTRUCT_SEEDS = list(range(200, 220))


@pytest.mark.parametrize("seed", CONSTRUCT_SEEDS)
def test_random_construct_vector_matches_select(spark, seed):
    """construct with a vector template ≡ select of the same vars
    (template instantiation is a bijection on solutions here), and the
    uri-grouped variant groups by the first var."""
    from matcha_spark import GRAFTER_URI, construct, select

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(1, 8))
    # no optionals: construct emits raw per-branch solutions while select
    # regroups into per-var cartesians — equivalence only holds without
    # optional blocks (optional construct/build is covered elsewhere)
    patterns = _rand_patterns(rng, depth=1)
    from matcha_spark.patterns import find_vars

    allv = find_vars(patterns)
    if len(allv) < 2:
        pytest.skip("need 2+ vars")
    pvars = allv[:2]

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        sel = select(pvars, patterns, db) or []
        con = construct(list(pvars), patterns, db) or []
        grouped = construct({GRAFTER_URI: pvars[0], "val": pvars[1]}, patterns, db) or []
    finally:
        db.unpersist()
    assert _blind({tuple(r) for r in con}) == _blind(set(sel))
    # grouped: every select row's value appears under its subject
    from .util import blind

    by_subj = {}
    for m in grouped:
        v = m.get("val")
        vals = v if isinstance(v, (set, frozenset)) else ({v} if "val" in m else set())
        by_subj[blind(m[GRAFTER_URI])] = {blind(x) for x in vals}
    for s, v in _blind(set(sel)):
        assert s in by_subj and v in by_subj[s], f"seed={seed} missing {s}->{v}"


BAG_SEEDS = list(range(200, 215))


@pytest.mark.parametrize("seed", BAG_SEEDS)
def test_random_bgp_bag_matches_model(spark, seed):
    """Bag-semantics differential: the engine's per-derivation multiset
    must equal the no-distinct reference model's, multiplicities
    included (markers blinded, compared as sorted multisets)."""
    from collections import Counter

    from matcha_spark.query import select_df
    from matcha_spark.terms import from_term

    from .model import model_select_bag

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(0, 10))
    patterns = _rand_patterns(rng)
    from matcha_spark.patterns import find_vars

    allv = find_vars(patterns)
    if not allv:
        pytest.skip("no vars generated")
    rng.shuffle(allv)
    pvars = allv[: rng.randint(1, len(allv))]

    def blind_one(v):
        return UNBOUND if isinstance(v, Unbound) or v == UNBOUND else v

    want = Counter(
        tuple(blind_one(v) for v in r) for r in model_select_bag(pvars, patterns, db_rows)
    )
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        df = select_df(pvars, patterns, db, bag_semantics=True)
        got = Counter(
            tuple(blind_one(from_term(r[v])) for v in df.columns) for r in df.collect()
        )
    finally:
        db.unpersist()
    assert got == want, (
        f"seed={seed}\ndb={db_rows}\npatterns={patterns}\npvars={pvars}\n"
        f"extra={got - want}\nmissing={want - got}"
    )


# ---------------------------------------------------------------------------
# select_agg differential: engine aggregates vs aggregates computed in
# Python over the model's bag-solution multiset
# ---------------------------------------------------------------------------


def _model_select_agg(group_vars, aggs, patterns, db):
    from matcha_spark.patterns import find_vars, var_name

    from .model import UNBOUND, model_select_bag

    allv = find_vars(patterns)
    rows = model_select_bag(allv, patterns, db)
    gidx = [allv.index(var_name(g)) for g in group_vars]
    groups: dict[tuple, list[tuple]] = {}
    for row in rows:
        groups.setdefault(tuple(row[i] for i in gidx), []).append(row)

    def is_num(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    out = {}
    for key, grp in groups.items():
        rec = {}
        for name, (op, v) in aggs.items():
            if v is None:
                assert op == "count"
                rec[name] = len(grp)
                continue
            vi = allv.index(var_name(v))
            vals = [r[vi] for r in grp if r[vi] is not UNBOUND]
            nums = [float(x) for x in vals if is_num(x)]
            if op == "count":
                rec[name] = len(vals)
            elif op == "count_distinct":
                rec[name] = len({repr(x) for x in vals})
            elif op == "sum":
                rec[name] = sum(nums) if nums else None
            elif op == "avg":
                rec[name] = sum(nums) / len(nums) if nums else None
            elif op == "min":
                rec[name] = min(nums) if nums else None
            elif op == "max":
                rec[name] = max(nums) if nums else None
        out[key] = rec
    return out


@pytest.mark.parametrize("seed", range(20))
def test_select_agg_differential(spark, seed):
    from matcha_spark import select_agg
    from matcha_spark.patterns import find_vars
    from matcha_spark.terms import from_term

    rng = random.Random(4200 + seed)
    db_rows = _rand_db(rng, rng.randint(6, 18))
    pats = _rand_patterns(rng)
    allv = find_vars(pats)
    if not allv:
        pytest.skip("no vars drawn")
    # group on a var from the first required pattern (dodges unbound
    # group keys — marker semantics are covered by the unit tests)
    from matcha_spark.patterns import Values, Optional as Opt, is_var, var_name

    req_vars = []
    for p in pats:
        if isinstance(p, (Values, Opt)):
            continue
        req_vars += [var_name(e) for e in p if is_var(e)]
    if not req_vars:
        pytest.skip("no required vars drawn")
    gvar = req_vars[0]
    avar = rng.choice(allv)
    aggs = {
        "n": ("count", None),
        "nb": ("count", avar),
        "nd": ("count_distinct", avar),
        "s": ("sum", avar),
        "mn": ("min", avar),
        "mx": ("max", avar),
    }
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select_agg([gvar], aggs, pats, db).collect()
    finally:
        db.unpersist()
    want = _model_select_agg([gvar], aggs, pats, db_rows)

    def freeze(v):
        from .model import _freeze

        return _freeze(v)

    got = {}
    for r in got_rows:
        key = (freeze(from_term(r[gvar])),)
        got[key] = {
            "n": r["n"], "nb": r["nb"], "nd": r["nd"],
            "s": r["s"], "mn": r["mn"], "mx": r["mx"],
        }
    assert set(got) == set(want), (sorted(got), sorted(want))
    for k in want:
        for name in ("n", "nb", "nd"):
            assert got[k][name] == want[k][name], (seed, k, name, got[k], want[k])
        for name in ("s", "mn", "mx"):
            a, b = got[k][name], want[k][name]
            if b is None:
                assert a is None, (seed, k, name)
            else:
                assert a is not None and abs(a - b) < 1e-9, (seed, k, name, a, b)


# ---------------------------------------------------------------------------
# composition differential (r08): property path → BIND → select_agg in one
# query, engine vs a pure-Python path-algebra + bag-aggregate model.  The
# comparison is order-insensitive (dict keyed by group), mirroring the
# reference's oracle policy (SURVEY §2.4.7).
# ---------------------------------------------------------------------------

PATH_NODES = [f"n{i}" for i in range(6)]
PATH_PREDS = ["p", "q", "r"]


def _rand_path_db(rng):
    n = rng.randint(4, 14)
    return list(
        {
            (rng.choice(PATH_NODES), rng.choice(PATH_PREDS), rng.choice(PATH_NODES))
            for _ in range(n)
        }
    )


def _rand_path_expr(rng, depth=0):
    from matcha_spark.patterns import (
        Alt,
        Inv,
        NegSet,
        OneOrMore,
        Seq,
        ZeroOrMore,
        ZeroOrOne,
    )

    forms = ["pred", "seq", "alt", "inv", "plus", "star", "opt", "neg"]
    form = rng.choice(forms) if depth < 2 else "pred"
    if form == "pred":
        return rng.choice(PATH_PREDS)
    if form == "seq":
        return Seq(*[_rand_path_expr(rng, depth + 1) for _ in range(2)])
    if form == "alt":
        return Alt(*[_rand_path_expr(rng, depth + 1) for _ in range(2)])
    if form == "inv":
        return Inv(_rand_path_expr(rng, depth + 1))
    if form == "plus":
        return OneOrMore(_rand_path_expr(rng, depth + 1))
    if form == "star":
        return ZeroOrMore(_rand_path_expr(rng, depth + 1))
    if form == "opt":
        return ZeroOrOne(_rand_path_expr(rng, depth + 1))
    return NegSet(*rng.sample(PATH_PREDS, rng.randint(1, 2)))


def _model_path_pairs(path, db_rows):
    """SPARQL path algebra over a concrete edge list, in plain Python."""
    from matcha_spark.patterns import (
        Alt,
        Inv,
        NegSet,
        OneOrMore,
        Seq,
        ZeroOrMore,
        ZeroOrOne,
    )

    nodes = {s for s, _, _ in db_rows} | {o for _, _, o in db_rows}

    def closure(pairs):
        out = set(pairs)
        while True:
            nxt = out | {(a, d) for a, b in out for c, d in out if b == c}
            if nxt == out:
                return out
            out = nxt

    def ev(p):
        if isinstance(p, Inv):
            return {(o, s) for s, o in ev(p.path)}
        if isinstance(p, Seq):
            acc = ev(p.steps[0])
            for step in p.steps[1:]:
                nxt = ev(step)
                acc = {(a, d) for a, b in acc for c, d in nxt if b == c}
            return acc
        if isinstance(p, Alt):
            out = set()
            for b in p.alts:
                out |= ev(b)
            return out
        if isinstance(p, OneOrMore):
            return closure(ev(p.path))
        if isinstance(p, ZeroOrMore):
            return closure(ev(p.path)) | {(n, n) for n in nodes}
        if isinstance(p, ZeroOrOne):
            return ev(p.path) | {(n, n) for n in nodes}
        if isinstance(p, NegSet):
            return {(s, o) for s, pr, o in db_rows if pr not in p.preds}
        return {(s, o) for s, pr, o in db_rows if pr == p}

    return ev(path)


@pytest.mark.parametrize("seed", range(12))
def test_path_bind_agg_differential(spark, seed):
    from pyspark.sql import functions as F

    from matcha_spark import Bind, select_agg
    from matcha_spark.functions.termcols import lex, str_col
    from matcha_spark.terms import from_term

    rng = random.Random(8800 + seed)
    db_rows = _rand_path_db(rng)
    path = _rand_path_expr(rng)
    extra_pred = rng.choice(PATH_PREDS) if rng.random() < 0.5 else None

    pats = [
        ("?a", path, "?b"),
        Bind("?c", lambda v: str_col(F.substring(lex(v["?b"]), 1, 2))),
    ]
    if extra_pred is not None:
        pats.append(("?b", extra_pred, "?d"))

    aggs = {
        "n": ("count", "?b"),
        "nd": ("count_distinct", "?b"),
        "ndc": ("count_distinct", "?c"),
    }

    # --- model: path pairs -> bind -> optional join -> bag aggregate ---
    pairs = _model_path_pairs(path, db_rows)
    rows = [(a, b, b[:2]) for a, b in pairs]
    if extra_pred is not None:
        rows = [
            (a, b, c)
            for a, b, c in rows
            for s, pr, o in db_rows
            if s == b and pr == extra_pred
        ]
    want = {}
    for a, b, c in rows:
        rec = want.setdefault(a, {"n": 0, "b": set(), "c": set()})
        rec["n"] += 1
        rec["b"].add(b)
        rec["c"].add(c)

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select_agg(["?a"], aggs, pats, db).collect()
    finally:
        db.unpersist()
    got = {from_term(r["?a"]): (r["n"], r["nd"], r["ndc"]) for r in got_rows}
    expect = {a: (rec["n"], len(rec["b"]), len(rec["c"])) for a, rec in want.items()}
    assert got == expect, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\nextra={extra_pred}\n"
        f"got={got}\nwant={expect}"
    )


@pytest.mark.parametrize("seed", range(16))
def test_path_bound_endpoint_differential(spark, seed):
    """Paths with a CONSTANT subject or object (ground endpoints filter
    the compiled edge set rather than projecting it) — engine vs the
    Python path algebra."""
    from matcha_spark import select
    from matcha_spark.terms import from_term

    rng = random.Random(9900 + seed)
    db_rows = _rand_path_db(rng)
    path = _rand_path_expr(rng)
    pairs = _model_path_pairs(path, db_rows)
    nodes = sorted({s for s, _, _ in db_rows} | {o for _, _, o in db_rows})
    anchor = rng.choice(nodes)
    if rng.random() < 0.5:
        # ground subject
        got = select(["?y"], [(anchor, path, "?y")], TriplesDB.from_triples(spark, db_rows))
        want = sorted(b for a, b in pairs if a == anchor)
    else:
        got = select(["?x"], [("?x", path, anchor)], TriplesDB.from_triples(spark, db_rows))
        want = sorted(a for a, b in pairs if b == anchor)
    got_list = sorted(str(g) for g in (got or []))
    assert got_list == want, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\nanchor={anchor}\n"
        f"got={got_list}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(8))
def test_path_relative_gate_differential(spark, seed, monkeypatch):
    """r11 (verdict ask #8): with the absolute seeding floor zeroed,
    the RELATIVE gate (anchor estimate vs the closure's edge-set
    estimate) alone decides — every anchored case must still seed and
    the results must match the all-pairs model, proving the gate never
    changes semantics, only the evaluation strategy."""
    from matcha_spark import select
    from matcha_spark.patterns import OneOrMore, ZeroOrMore
    from matcha_spark.plans import compiler as C

    monkeypatch.setattr(C, "SEEDED_FRONTIER_EST", 0.0)
    rng = random.Random(7700 + seed)
    db_rows = _rand_path_db(rng)
    inner = _rand_path_expr(rng, depth=1)
    path = OneOrMore(inner) if rng.random() < 0.5 else ZeroOrMore(inner)
    pairs = _model_path_pairs(path, db_rows)
    nodes = sorted({s for s, _, _ in db_rows} | {o for _, _, o in db_rows})
    ap = rng.choice(PATH_PREDS)
    anchor_obj = rng.choice(nodes)
    anchors = {s for s, p, o in db_rows if p == ap and o == anchor_obj}
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(
            ["?m", "?y"],
            [("?m", ap, anchor_obj), ("?m", path, "?y")],
            db,
        )
        want = sorted((str(a), str(b)) for a, b in pairs if a in anchors)
        got_list = sorted((str(x), str(y)) for x, y in (got or []))
    finally:
        db.unpersist()
    assert got_list == want, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\n"
        f"anchor=({ap}, {anchor_obj})\ngot={got_list}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(14))
def test_path_selective_var_anchor_differential(spark, seed):
    """r10: a var-endpoint closure anchored by a selective prior
    pattern takes the deferred seeded evaluation
    (``_join_deferred_closure``); results must equal the all-pairs
    path algebra joined with the anchor pattern, on both endpoint
    sides, over random graphs and random anchors."""
    from matcha_spark import select
    from matcha_spark.patterns import OneOrMore, ZeroOrMore

    from matcha_spark.patterns import Alt, Inv, Seq

    rng = random.Random(6600 + seed)
    db_rows = _rand_path_db(rng)
    inner = _rand_path_expr(rng, depth=1)
    clo = OneOrMore(inner) if rng.random() < 0.5 else ZeroOrMore(inner)
    # the closure may sit anywhere in a composite top-level path — the
    # deferral triggers on _contains_closure, and the seeded evaluation
    # must thread the computed anchor set through Seq/Alt/Inv too
    path = rng.choice(
        [
            clo,
            clo,
            Seq(rng.choice(PATH_PREDS), clo),
            Alt(clo, rng.choice(PATH_PREDS)),
            Inv(clo),
        ]
    )
    pairs = _model_path_pairs(path, db_rows)
    nodes = sorted({s for s, _, _ in db_rows} | {o for _, _, o in db_rows})
    ap = rng.choice(PATH_PREDS)
    anchor_obj = rng.choice(nodes)
    anchors = {s for s, p, o in db_rows if p == ap and o == anchor_obj}
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        if rng.random() < 0.5:
            got = select(
                ["?x", "?m"],
                [("?m", ap, anchor_obj), ("?x", path, "?m")],
                db,
            )
            want = sorted((str(a), str(b)) for a, b in pairs if b in anchors)
        else:
            got = select(
                ["?m", "?y"],
                [("?m", ap, anchor_obj), ("?m", path, "?y")],
                db,
            )
            want = sorted((str(a), str(b)) for a, b in pairs if a in anchors)
        got_list = sorted((str(x), str(y)) for x, y in (got or []))
    finally:
        db.unpersist()
    assert got_list == want, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\n"
        f"anchor=({ap}, {anchor_obj})\ngot={got_list}\nwant={want}"
    )


def _rand_deep_path(rng, depth=0):
    """Like :func:`_rand_path_expr` but one nesting level deeper —
    depth-3 trees reach compositions (closure of an Alt of a Seq of an
    Inv) the depth-2 generator cannot produce."""
    from matcha_spark.patterns import (
        Alt,
        Inv,
        NegSet,
        OneOrMore,
        Seq,
        ZeroOrMore,
        ZeroOrOne,
    )

    forms = ["pred", "seq", "alt", "inv", "plus", "star", "opt", "neg"]
    form = rng.choice(forms) if depth < 3 else "pred"
    if form == "pred":
        return rng.choice(PATH_PREDS)
    if form == "seq":
        return Seq(*[_rand_deep_path(rng, depth + 1) for _ in range(2)])
    if form == "alt":
        return Alt(*[_rand_deep_path(rng, depth + 1) for _ in range(2)])
    if form == "inv":
        return Inv(_rand_deep_path(rng, depth + 1))
    if form == "plus":
        return OneOrMore(_rand_deep_path(rng, depth + 1))
    if form == "star":
        return ZeroOrMore(_rand_deep_path(rng, depth + 1))
    if form == "opt":
        return ZeroOrOne(_rand_deep_path(rng, depth + 1))
    return NegSet(*rng.sample(PATH_PREDS, rng.randint(1, 2)))


# endpoint shapes: ground-subject (forward scan), ground-object
# (backward scan), ground-ground (existence), var-var behind a
# selective anchor on the subject (deferred closure, forward walk) and
# on the object (deferred closure, backward walk)
_MATRIX_SHAPES = ("gv", "vg", "gg", "vv_fwd", "vv_bwd")


def _matrix_case(seed):
    """Deterministic (db, path, shape, force_seed) schedule for the
    endpoint-matrix fuzzer — factored out so the schedule meta-test
    below can assert coverage without running Spark.  seed % 5 walks
    the shapes, seed % 2 toggles the zeroed seeding floor; 5 and 2 are
    coprime, so 32 seeds cover all 10 combinations."""
    rng = random.Random(5500 + seed)
    db_rows = _rand_path_db(rng)
    path = _rand_deep_path(rng)
    return rng, db_rows, path, _MATRIX_SHAPES[seed % 5], seed % 2 == 0


def test_path_endpoint_matrix_schedule():
    """The 32-seed schedule exercises every endpoint shape under both
    seeding-gate settings (so the seeded, all-pairs, existence, and
    both deferred-closure walk directions all run)."""
    combos = {(s % 5, s % 2) for s in range(32)}
    assert combos == {(i, j) for i in range(5) for j in range(2)}


@pytest.mark.parametrize("seed", range(32))
def test_path_endpoint_matrix_differential(spark, seed, monkeypatch):
    """r15 (verdict ask #7, the path-algebra half): one consolidated
    fuzzer over the FULL endpoint matrix — random depth-3
    Seq/Alt/Inv/NegSet/closure trees x {ground subject, ground object,
    ground-ground, var-var + selective anchor on either side} against
    the pure-Python path algebra (:func:`_model_path_pairs`).  Half
    the seeds zero ``SEEDED_FRONTIER_EST`` so the seeded scan and the
    ``_join_deferred_closure`` paths (compiler.py) are forced even on
    tiny graphs; the other half keep the production gate.  Both walk
    directions of the deferred path are pinned by the shape schedule
    (meta-test above)."""
    from matcha_spark import ask, select
    from matcha_spark.plans import compiler as C

    rng, db_rows, path, shape, force_seed = _matrix_case(seed)
    if force_seed:
        monkeypatch.setattr(C, "SEEDED_FRONTIER_EST", 0.0)
    pairs = _model_path_pairs(path, db_rows)
    nodes = sorted({s for s, _, _ in db_rows} | {o for _, _, o in db_rows})
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        if shape == "gv":
            anchor = rng.choice(nodes)
            got = sorted(
                str(g) for g in (select(["?y"], [(anchor, path, "?y")], db) or [])
            )
            want = sorted(b for a, b in pairs if a == anchor)
        elif shape == "vg":
            anchor = rng.choice(nodes)
            got = sorted(
                str(g) for g in (select(["?x"], [("?x", path, anchor)], db) or [])
            )
            want = sorted(a for a, b in pairs if b == anchor)
        elif shape == "gg":
            a1, a2 = rng.choice(nodes), rng.choice(nodes)
            got = ask([(a1, path, a2)], db)
            want = (a1, a2) in pairs
        else:
            ap = rng.choice(PATH_PREDS)
            anchor_obj = rng.choice(nodes)
            anchors = {s for s, p, o in db_rows if p == ap and o == anchor_obj}
            if shape == "vv_fwd":
                res = select(
                    ["?m", "?y"], [("?m", ap, anchor_obj), ("?m", path, "?y")], db
                )
                want = sorted((str(a), str(b)) for a, b in pairs if a in anchors)
            else:
                res = select(
                    ["?x", "?m"], [("?m", ap, anchor_obj), ("?x", path, "?m")], db
                )
                want = sorted((str(a), str(b)) for a, b in pairs if b in anchors)
            got = sorted((str(x), str(y)) for x, y in (res or []))
    finally:
        db.unpersist()
    assert got == want, (
        f"seed={seed}\nshape={shape}\nforce_seed={force_seed}\n"
        f"db={db_rows}\npath={path!r}\ngot={got}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_path_bind_agg_modifiers_differential(spark, seed):
    """r09: the r08 additions interact — select_agg's solution
    modifiers (HAVING / ORDER BY / LIMIT / OFFSET) over property-path +
    Bind patterns, engine vs the Python path algebra with an identical
    deterministic total order.  Order-SENSITIVE comparison: the whole
    point of the modifiers is the final row order and cut."""
    from pyspark.sql import functions as F

    from matcha_spark import Bind, select_agg
    from matcha_spark.functions.termcols import lex, str_col
    from matcha_spark.terms import from_term

    rng = random.Random(7700 + seed)
    db_rows = _rand_path_db(rng)
    path = _rand_path_expr(rng)

    pats = [
        ("?a", path, "?b"),
        Bind("?c", lambda v: str_col(F.substring(lex(v["?b"]), 1, 2))),
    ]
    aggs = {"n": ("count", "?b"), "ndc": ("count_distinct", "?c")}
    with_having = rng.random() < 0.5
    limit = rng.choice([None, 1, 2, 3, 4])
    offset = rng.choice([None, 1, 2]) if rng.random() < 0.4 else None
    having = (lambda c: c["n"] >= 2) if with_having else None

    # --- model: path pairs -> bind -> bag aggregate -> modifiers ---
    pairs = _model_path_pairs(path, db_rows)
    want = {}
    for a, b in pairs:
        rec = want.setdefault(a, {"n": 0, "c": set()})
        rec["n"] += 1
        rec["c"].add(b[:2])
    rows = [(a, rec["n"], len(rec["c"])) for a, rec in want.items()]
    if with_having:
        rows = [r for r in rows if r[1] >= 2]
    # order_by=["-n", "?a"]: count desc, group term lex asc (total order
    # — ?a is unique per group, so ties break fully on both sides)
    rows.sort(key=lambda r: (-r[1], r[0]))
    if offset is not None:
        rows = rows[offset:]
    if limit is not None:
        rows = rows[:limit]

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select_agg(
            ["?a"],
            aggs,
            pats,
            db,
            having=having,
            order_by=["-n", "?a"],
            limit=limit,
            offset=offset,
        ).collect()
    finally:
        db.unpersist()
    got = [(from_term(r["?a"]), r["n"], r["ndc"]) for r in got_rows]
    assert got == rows, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\nhaving={with_having} "
        f"limit={limit} offset={offset}\ngot={got}\nwant={rows}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_select_agg_concat_sample_differential(spark, seed):
    """group_concat (canonically sorted lexical join) and sample
    (canonical-least bound term) vs the Python model — the order-
    sensitive aggregates the numeric differential battery skips."""
    from matcha_spark import select_agg
    from matcha_spark.patterns import find_vars, is_var, var_name
    from matcha_spark.patterns import Optional as Opt
    from matcha_spark.patterns import Values
    from matcha_spark.terms import from_term, sort_key, to_term

    from .model import UNBOUND, model_select_bag

    rng = random.Random(6600 + seed)
    db_rows = _rand_db(rng, rng.randint(6, 18))
    pats = _rand_patterns(rng)
    allv = find_vars(pats)
    req_vars = []
    for p in pats:
        if isinstance(p, (Values, Opt)):
            continue
        req_vars += [var_name(e) for e in p if is_var(e)]
    if not req_vars:
        pytest.skip("no required vars drawn")
    gvar, avar = req_vars[0], rng.choice(allv)

    got_rows = None
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select_agg(
            [gvar],
            {"gc": ("group_concat", avar), "sp": ("sample", avar)},
            pats,
            db,
            concat_sep="|",
        ).collect()
    finally:
        db.unpersist()

    def lexish(v):
        # mirror of select_agg's lexish: doubles via num, else term lex
        k, lx, num, _lang, _dt = to_term(v)
        return str(num) if k == "double" else lx

    rows = model_select_bag(allv, pats, db_rows)
    gi, ai = allv.index(gvar), allv.index(avar)
    want = {}
    for row in rows:
        rec = want.setdefault(_freeze_key(row[gi]), {"vals": []})
        if row[ai] is not UNBOUND:
            rec["vals"].append(row[ai])
    for rec in want.values():
        vals = rec["vals"]
        rec["gc"] = "|".join(sorted(lexish(v) for v in vals))
        rec["sp"] = min(vals, key=sort_key) if vals else None

    got = {}
    for r in got_rows:
        key = _freeze_key(from_term(r[gvar]))
        sp = from_term(r["sp"]) if r["sp"] is not None else None
        got[key] = {"gc": r["gc"] or "", "sp": sp}
    assert set(got) == set(want), (sorted(map(repr, got)), sorted(map(repr, want)))
    for k in want:
        assert got[k]["gc"] == want[k]["gc"], (seed, k, got[k], want[k])
        assert repr(got[k]["sp"]) == repr(want[k]["sp"]), (seed, k, got[k], want[k])


def _freeze_key(v):
    from .model import _freeze

    return _freeze(v)


@pytest.mark.parametrize("seed", range(10))
def test_subselect_agg_differential(spark, seed):
    """r09 subqueries: a random aggregate SubSelect joined with a random
    outer pattern, engine vs the Python bag-aggregate model (the
    subquery aggregates the inner bag-solution multiset; the join is a
    solution-mapping join on the group var)."""
    from matcha_spark import SubSelect, TriplesDB, select
    from matcha_spark.patterns import find_vars
    from matcha_spark.terms import from_term

    from .model import model_select_bag

    rng = random.Random(5500 + seed)
    db_rows = _rand_db(rng, rng.randint(4, 12))
    inner, allv = [], []
    for _ in range(20):  # redraw until the subquery has 2+ vars
        inner = [
            _rand_pattern(rng, allow_var=0.8)
            for _ in range(rng.randint(1, 2))
        ]
        allv = find_vars(inner)
        if len(allv) >= 2:
            break
    else:
        pytest.skip("no 2-var draw in 20 tries")
    gvar, avar = allv[0], allv[-1]
    outer_pred = rng.choice(PREDS)
    sub = SubSelect([gvar], inner, aggs={"?cnt": ("count", avar)})
    pats = [sub, (gvar, outer_pred, "?z")]

    # model: inner bag solutions -> per-group count of bound avar ->
    # join on gvar against the outer pattern's scan
    rows = model_select_bag(allv, inner, db_rows)
    gi, ai = allv.index(gvar), allv.index(avar)
    counts = {}
    for row in rows:
        if row[ai] is not UNBOUND:
            counts[_freeze_key(row[gi])] = counts.get(_freeze_key(row[gi]), 0) + 1
    want = set()
    for s, p, o in db_rows:
        if p == outer_pred and _freeze_key(s) in counts:
            want.add((_freeze_key(s), counts[_freeze_key(s)], _freeze_key(o)))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select([gvar, "?cnt", "?z"], pats, db) or []
    finally:
        db.unpersist()
    got = {
        (_freeze_key(g), c, _freeze_key(z)) for g, c, z in got_rows
    }
    assert got == want, (
        f"seed={seed}\ndb={db_rows}\ninner={inner}\nouter={outer_pred}\n"
        f"got={got}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_negation_differential(spark, seed):
    """r09: random NOT EXISTS / EXISTS / MINUS blocks (correlated and
    uncorrelated) over random BGPs + Values + Optionals, engine vs the
    Python model extended with the same semi/anti-join semantics."""
    from matcha_spark import Exists, Minus, NotExists
    from matcha_spark.patterns import find_vars

    from .model import model_select

    rng = random.Random(3300 + seed)
    db_rows = _rand_db(rng, rng.randint(3, 12))
    patterns = _rand_patterns(rng)
    kinds = [NotExists, Exists, Minus]
    for _ in range(rng.randint(1, 2)):
        block = [_rand_pattern(rng) for _ in range(rng.randint(1, 2))]
        patterns.append(rng.choice(kinds)(block))
    allv = find_vars(patterns)
    if not allv:
        pytest.skip("no vars generated")
    rng.shuffle(allv)
    pvars = allv[: rng.randint(1, len(allv))]

    expected = _blind(model_select(pvars, patterns, db_rows))
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, patterns, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={patterns}\npvars={pvars}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_subselect_path_negation_differential(spark, seed):
    """r10 (verdict ask #8): the r09 features interact — an aggregate
    SubSelect whose inner pattern is a random property path, joined to
    an outer scan and pruned by an Exists/NotExists whose block is
    ITSELF a path pattern.  Engine vs the Python path algebra composed
    by hand."""
    from matcha_spark import SubSelect, select
    from matcha_spark.patterns import Exists, NotExists

    rng = random.Random(3100 + seed)
    db_rows = _rand_path_db(rng)
    path_in = _rand_path_expr(rng)
    path_neg = _rand_path_expr(rng)
    ex_cls = NotExists if rng.random() < 0.5 else Exists
    ap = rng.choice(PATH_PREDS)

    sub = SubSelect(
        ["?a"], [("?a", path_in, "?b")], aggs={"?cnt": ("count", "?b")}
    )
    pats = [sub, ("?a", ap, "?c"), ex_cls([("?c", path_neg, "?d")])]

    # model: path pairs (set semantics) -> per-subject count -> join on
    # the outer scan -> semi/anti on the negation path's source set
    pairs_in = _model_path_pairs(path_in, db_rows)
    counts = {}
    for a, _b in pairs_in:
        counts[a] = counts.get(a, 0) + 1
    neg_srcs = {a for a, _b in _model_path_pairs(path_neg, db_rows)}
    want = set()
    for s, p, o in db_rows:
        if p == ap and s in counts:
            hit = o in neg_srcs
            if (hit and ex_cls is Exists) or (not hit and ex_cls is NotExists):
                want.add((str(s), counts[s], str(o)))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select(["?a", "?cnt", "?c"], pats, db) or []
    finally:
        db.unpersist()
    got = {(str(a), c, str(cc)) for a, c, cc in got_rows}
    assert got == want, (
        f"seed={seed}\ndb={db_rows}\npath_in={path_in!r}\n"
        f"path_neg={path_neg!r}\nneg={ex_cls.__name__} ap={ap}\n"
        f"got={got}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_values_rows_undef_optional_differential(spark, seed):
    """r10 (verdict ask #8): ValuesRows with UNDEF rows over a
    pattern-bound var composes with Optional regroup — engine vs the
    Python model's regrouped rows with the inline-data join applied by
    hand (UNDEF rows admit every solution; each row contributes its
    always-defined new-var value)."""
    from matcha_spark.patterns import Optional as Opt
    from matcha_spark.patterns import ValuesRows

    rng = random.Random(2400 + seed)
    db_rows = _rand_path_db(rng)
    p1, p2 = rng.choice(PATH_PREDS), rng.choice(PATH_PREDS)
    pats_base = [("?s", p1, "?o"), Opt([("?o", p2, "?t")])]
    subjects = sorted({s for s, p, _o in db_rows if p == p1})
    if not subjects:
        pytest.skip("no p1 edges drawn")
    vr_rows = []
    for _ in range(rng.randint(1, 4)):
        sval = None if rng.random() < 0.4 else rng.choice(subjects)
        vr_rows.append((sval, rng.randint(0, 3)))
    pats = pats_base + [ValuesRows(["?s", "?x"], vr_rows)]

    model_rows = model_select(["?s", "?o", "?t"], pats_base, db_rows)
    want = set()
    for s, o, t in model_rows:
        for sval, xval in vr_rows:
            if sval is None or sval == s:
                want.add((str(s), str(o), None if t is UNBOUND else str(t), xval))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select(["?s", "?o", "?t", "?x"], pats, db) or []
    finally:
        db.unpersist()
    got = {
        (
            str(s),
            str(o),
            None if isinstance(t, Unbound) or t is None else str(t),
            x,
        )
        for s, o, t, x in got_rows
    }
    assert got == want, (
        f"seed={seed}\ndb={db_rows}\np1={p1} p2={p2}\nrows={vr_rows}\n"
        f"got={got}\nwant={want}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_seeded_path_modifiers_differential(spark, seed):
    """r10 (verdict ask #8): deferred selective-var seeded closures
    under solution modifiers — ORDER BY / LIMIT / OFFSET over the
    seeded pair join must produce exactly the all-pairs algebra's
    ordered-and-cut rows."""
    from matcha_spark import select_df
    from matcha_spark.patterns import OneOrMore, ZeroOrMore
    from matcha_spark.terms import from_term

    rng = random.Random(1700 + seed)
    db_rows = _rand_path_db(rng)
    inner = _rand_path_expr(rng, depth=1)
    path = OneOrMore(inner) if rng.random() < 0.5 else ZeroOrMore(inner)
    ap = rng.choice(PATH_PREDS)
    nodes = sorted({s for s, _, _ in db_rows} | {o for _, _, o in db_rows})
    anchor_obj = rng.choice(nodes)
    anchors = {s for s, p, o in db_rows if p == ap and o == anchor_obj}
    rows = sorted(
        (a, b) for a, b in _model_path_pairs(path, db_rows) if a in anchors
    )
    limit = rng.choice([None, 1, 2, 4])
    offset = rng.choice([None, 1, 2])
    want = rows[(offset or 0):]
    if limit is not None:
        want = want[:limit]

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got_rows = select_df(
            ["?m", "?y"],
            [("?m", ap, anchor_obj), ("?m", path, "?y")],
            db,
            order_by=["?m", "?y"],
            limit=limit,
            offset=offset,
        ).collect()
    finally:
        db.unpersist()
    got = [(from_term(r["?m"]), from_term(r["?y"])) for r in got_rows]
    assert got == want, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\n"
        f"anchor=({ap}, {anchor_obj}) limit={limit} offset={offset}\n"
        f"got={got}\nwant={want}"
    )


FILTER_SEEDS = list(range(1400, 1430))


@pytest.mark.parametrize("seed", FILTER_SEEDS)
def test_filter_differential(spark, seed):
    """Filter (Spark-native extension, r13): random required+VALUES
    queries with a numeric FILTER at a random list position, engine vs
    ``model_select`` over the full var width with a Python mirror of
    the predicate applied row-wise, then projected.  Sound because the
    documented evaluation order runs filters on the required+VALUES
    solution set (no optionals are generated), so placement in the
    pattern list cannot change the answer; non-numeric and nil
    bindings must fail the numeric predicate in both worlds (SQL
    null-comparison vs Python type check)."""
    from matcha_spark import Filter
    from matcha_spark.functions.termcols import lex_as
    from matcha_spark.patterns import find_vars

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(0, 12))
    pats = [_rand_pattern(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.5:
        pats.append(
            Values(
                rng.choice(VARS),
                [rng.choice(POOL) for _ in range(rng.randint(0, 3))],
            )
        )
    allv = find_vars(pats)
    if not allv:
        pytest.skip("no vars generated")
    fvar = rng.choice(sorted(allv))
    thr = rng.choice([0, 1])
    if rng.random() < 0.5:
        pred_col = lambda v: lex_as(v[fvar], "bigint") >= thr  # noqa: E731
        pred_py = lambda x: (  # noqa: E731
            isinstance(x, int) and not isinstance(x, bool) and x >= thr
        )
    else:
        pred_col = lambda v: lex_as(v[fvar], "bigint") < thr  # noqa: E731
        pred_py = lambda x: (  # noqa: E731
            isinstance(x, int) and not isinstance(x, bool) and x < thr
        )
    pats_f = list(pats)
    pats_f.insert(rng.randint(0, len(pats_f)), Filter(pred_col))
    order = sorted(allv)
    rng.shuffle(order)
    pvars = order[: rng.randint(1, len(order))]

    wide_vars = sorted(allv)
    wide = model_select(wide_vars, pats, db_rows)
    fidx = wide_vars.index(fvar)
    expected = _blind(
        {
            tuple(r[wide_vars.index(p)] for p in pvars)
            for r in wide
            if pred_py(r[fidx])
        }
    )

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats_f, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={pats_f}\npvars={pvars}\n"
        f"fvar={fvar} thr={thr}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_negation_filter_combo_differential(spark, seed):
    """r16 (verdict ask #7): random NotExists/Minus blocks COMBINED
    with a numeric Filter over generated required+VALUES BGPs — the
    two per-row prunes commute (each decides a row from that row's
    bindings alone), so the model applies negation via model_select
    and the predicate row-wise, in either order.  No optionals by the
    same documented-evaluation-order argument as
    test_filter_differential; negation-with-optionals is covered
    (filterless) by test_negation_differential."""
    from matcha_spark import Filter, Minus, NotExists
    from matcha_spark.functions.termcols import lex_as
    from matcha_spark.patterns import find_vars

    from .model import model_select

    rng = random.Random(4400 + seed)
    db_rows = _rand_db(rng, rng.randint(3, 12))
    req = [_rand_pattern(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.5:
        req.append(
            Values(
                rng.choice(VARS),
                [rng.choice(POOL) for _ in range(rng.randint(0, 3))],
            )
        )
    reqv = find_vars(req)
    if not reqv:
        pytest.skip("no vars generated")
    pats = list(req)
    for _ in range(rng.randint(1, 2)):
        block = [_rand_pattern(rng) for _ in range(rng.randint(1, 2))]
        pats.append((NotExists if rng.random() < 0.5 else Minus)(block))

    fvar = rng.choice(sorted(reqv))
    thr = rng.choice([0, 1])
    if rng.random() < 0.5:
        pred_col = lambda v: lex_as(v[fvar], "bigint") >= thr  # noqa: E731
        pred_py = lambda x: (  # noqa: E731
            isinstance(x, int) and not isinstance(x, bool) and x >= thr
        )
    else:
        pred_col = lambda v: lex_as(v[fvar], "bigint") < thr  # noqa: E731
        pred_py = lambda x: (  # noqa: E731
            isinstance(x, int) and not isinstance(x, bool) and x < thr
        )
    pats_f = list(pats)
    pats_f.insert(rng.randint(0, len(pats_f)), Filter(pred_col))
    order = sorted(reqv)
    rng.shuffle(order)
    pvars = order[: rng.randint(1, len(order))]

    wide_vars = sorted(reqv)
    wide = model_select(wide_vars, pats, db_rows)  # negation applied
    fidx = wide_vars.index(fvar)
    expected = _blind(
        {
            tuple(r[wide_vars.index(p)] for p in pvars)
            for r in wide
            if pred_py(r[fidx])
        }
    )

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats_f, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={pats_f}\npvars={pvars}\n"
        f"fvar={fvar} thr={thr}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_optional_negation_combo_differential(spark, seed):
    """r17 (verdict ask #7): every seed COMBINES Optional blocks with
    NotExists/Minus in one query — the regroup-then-negate seam the
    r09 fuzzer only samples by chance (its generator makes optionals
    and NotExists/Minus independently likely; forcing both per seed
    pins the interaction: negation prunes solutions AFTER the optional
    regrouping, so a Minus sharing only an optional-bound var must
    honor UNBOUND-compatibility, and a NotExists block touching an
    optional var must see the extended bindings).  Engine vs the
    Python model over the same pattern order (required -> VALUES ->
    optionals -> negations, the documented evaluation regrouping)."""
    from matcha_spark import Minus, NotExists
    from matcha_spark.patterns import find_vars

    from .model import model_select

    rng = random.Random(5500 + seed)
    db_rows = _rand_db(rng, rng.randint(3, 12))
    pats = [_rand_pattern(rng) for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.4:
        pats.append(
            Values(
                rng.choice(VARS),
                [rng.choice(POOL) for _ in range(rng.randint(0, 3))],
            )
        )
    for _ in range(rng.randint(1, 2)):
        # depth 0 allows one nested Optional inside the block
        depth = 1 if rng.random() < 0.5 else 0
        pats.append(Optional(_rand_patterns(rng, depth)))
    for _ in range(rng.randint(1, 2)):
        block = [_rand_pattern(rng) for _ in range(rng.randint(1, 2))]
        pats.append((NotExists if rng.random() < 0.5 else Minus)(block))
    allv = find_vars(pats)
    if not allv:
        pytest.skip("no vars generated")
    rng.shuffle(allv)
    pvars = allv[: rng.randint(1, len(allv))]

    expected = _blind(model_select(pvars, pats, db_rows))
    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={pats}\npvars={pvars}"
    )


@pytest.mark.parametrize("seed", range(20))
def test_path_optional_combo_differential(spark, seed):
    """r17: property paths COMBINED with an Optional block — the path
    algebra's derived (?a, ?b) pairs feeding the optional
    regroup-and-cartesian-explode machinery, a seam no other fuzzer
    crosses (path fuzzers project/aggregate, optional fuzzers use
    plain patterns).  The model composes by hand: path pairs via the
    Python path algebra, then per required solution the block's
    per-var value SETS cartesian-explode (the reference's documented
    optional semantics — NOT a left join) with UNBOUND markers when
    the block misses."""
    from matcha_spark.patterns import Optional as Opt

    rng = random.Random(6600 + seed)
    db_rows = _rand_path_db(rng)
    path = _rand_path_expr(rng)
    p1 = rng.choice(PATH_PREDS)
    two = rng.random() < 0.5
    block = [("?b", p1, "?d")]
    if two:
        p2 = rng.choice(PATH_PREDS)
        block.append(("?d", p2, "?e"))
    pvars = ["?a", "?b", "?d"] + (["?e"] if two else [])
    rng.shuffle(pvars)

    pairs = _model_path_pairs(path, db_rows)
    idx = {v: i for i, v in enumerate(["?a", "?b", "?d", "?e"])}
    expected = set()
    for a, b in pairs:
        if two:
            sols = [
                (d, e)
                for s1, pr1, d in db_rows if s1 == b and pr1 == p1
                for s2, pr2, e in db_rows if s2 == d and pr2 == p2
            ]
            dset = sorted({d for d, _ in sols})
            eset = sorted({e for _, e in sols})
            combos = (
                [(d, e) for d in dset for e in eset]
                if sols else [(UNBOUND, UNBOUND)]
            )
        else:
            dset = sorted({d for s1, pr1, d in db_rows
                           if s1 == b and pr1 == p1})
            combos = [(d, None) for d in dset] if dset else [(UNBOUND, None)]
        for d, e in combos:
            full = (a, b, d, e)
            expected.add(tuple(full[idx[v]] for v in pvars))
    expected = _blind(expected)

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, [("?a", path, "?b"), Opt(block)], db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}\nblock={block}\n"
        f"pvars={pvars}"
    )


# --- Bind expression fuzz (r14, verdict ask #7) ------------------------
#
# Two randomized generators over the termfns algebra — numeric trees
# (t_add/t_sub/t_mul/t_abs over vars and int literals) and string trees
# (t_ucase/t_lcase/t_substr/t_concat/t_strlen over vars) — each with an
# exact Python mirror over (kind, lex, num) term triples, chained binds
# (a second bind may read the first's var), engine vs mirror through
# the full select() decode.  The numeric family is integral-only by
# construction so Java and Python double renderings cannot diverge; the
# string family never wraps an arithmetic result for the same reason.
# First catch: from_term crashed on NULL-num doubles (error-as-absence
# arithmetic over a non-numeric var) instead of decoding to None.

_NUMERIC_KINDS_PY = ("int", "double", "bool", "date", "datetime")


def _mirror_num(t):
    """tests-side twin of termfns.t_num over a (kind, lex, num) triple."""
    if t is None:
        return None
    return t[2] if t[0] in _NUMERIC_KINDS_PY else None


def _mirror_render(t):
    """tests-side twin of termfns._render (doubles render from num)."""
    if t is None:
        return None
    kind, lex_, num = t
    if kind == "double":
        return str(num) if num is not None else None
    if kind == "unbound":
        return None
    return lex_


def _mirror_decode(t):
    """tests-side twin of terms.from_term for the kinds the fuzz
    produces (null/int/str/double, incl. NULL-num error doubles)."""
    kind, lex_, num = t
    if kind == "null":
        return None
    if kind == "int":
        return int(lex_)
    if kind == "double":
        return float(num) if num is not None else None
    return lex_


def _rand_num_bind_expr(rng, avail, depth=0):
    """(fn: {var: Column} -> Column, mirror: {var: term} -> term) for a
    random arithmetic termfns tree."""
    from matcha_spark.functions import termfns as T
    from matcha_spark.terms import term_lit, to_term

    if depth >= 2 or (depth > 0 and rng.random() < 0.45):
        if avail and rng.random() < 0.75:
            v = rng.choice(avail)
            return (lambda b, v=v: b[v]), (lambda m, v=v: m[v])
        k = rng.randint(-3, 3)
        t = to_term(k)[:3]
        return (lambda b, k=k: term_lit(k)), (lambda m, t=t: t)
    if rng.random() < 0.15:
        f, g = _rand_num_bind_expr(rng, avail, depth + 1)

        def mir_abs(m, g=g):
            x = _mirror_num(g(m))
            return ("double", "", abs(x) if x is not None else None)

        return (lambda b, f=f: T.t_abs(f(b))), mir_abs
    op = rng.choice(["add", "sub", "mul"])
    tf = {"add": T.t_add, "sub": T.t_sub, "mul": T.t_mul}[op]
    pyop = {
        "add": lambda x, y: x + y,
        "sub": lambda x, y: x - y,
        "mul": lambda x, y: x * y,
    }[op]
    fa, ga = _rand_num_bind_expr(rng, avail, depth + 1)
    fb, gb = _rand_num_bind_expr(rng, avail, depth + 1)

    def mir(m, ga=ga, gb=gb, pyop=pyop):
        x, y = _mirror_num(ga(m)), _mirror_num(gb(m))
        bad = x is None or y is None
        return ("double", "", None if bad else pyop(x, y))

    return (lambda b, fa=fa, fb=fb, tf=tf: tf(fa(b), fb(b))), mir


def _rand_str_bind_expr(rng, avail, depth=0):
    """(fn, mirror) for a random string termfns tree (render-based ops
    coalesce a NULL render to '' exactly like the engine)."""
    from matcha_spark.functions import termfns as T

    def rend(t):
        r = _mirror_render(t)
        return "" if r is None else r

    if depth >= 2 or (depth > 0 and rng.random() < 0.4):
        v = rng.choice(avail)
        return (lambda b, v=v: b[v]), (lambda m, v=v: m[v])
    form = rng.choice(
        ["ucase", "lcase", "substr", "substr_tail", "concat", "strlen",
         "replace"]
    )
    if form == "concat":
        sep = rng.choice(["", "-"])
        fa, ga = _rand_str_bind_expr(rng, avail, depth + 1)
        fb, gb = _rand_str_bind_expr(rng, avail, depth + 1)

        def mir_cat(m, ga=ga, gb=gb, sep=sep):
            return ("str", rend(ga(m)) + sep + rend(gb(m)), 0.0)

        return (
            lambda b, fa=fa, fb=fb, sep=sep: T.t_concat(fa(b), fb(b), sep=sep)
        ), mir_cat
    f, g = _rand_str_bind_expr(rng, avail, depth + 1)
    if form == "substr":
        pos, ln = rng.randint(1, 3), rng.randint(1, 3)

        def mir_sub(m, g=g, pos=pos, ln=ln):
            return ("str", rend(g(m))[pos - 1 : pos - 1 + ln], 0.0)

        return (lambda b, f=f, pos=pos, ln=ln: T.t_substr(f(b), pos, ln)), mir_sub
    if form == "substr_tail":
        pos = rng.randint(1, 3)

        def mir_tail(m, g=g, pos=pos):
            return ("str", rend(g(m))[pos - 1 :], 0.0)

        return (lambda b, f=f, pos=pos: T.t_substr(f(b), pos)), mir_tail
    if form == "replace":
        # literal-safe pattern: a single letter means the same thing to
        # Java regex and Python str.replace
        pat = rng.choice(["x", "k", "a", "0"])
        repl = rng.choice(["", "_", "Z"])

        def mir_rep(m, g=g, pat=pat, repl=repl):
            return ("str", rend(g(m)).replace(pat, repl), 0.0)

        return (
            lambda b, f=f, pat=pat, repl=repl: T.t_replace(f(b), pat, repl)
        ), mir_rep
    if form == "strlen":

        def mir_len(m, g=g):
            n = len(rend(g(m)))
            return ("int", str(n), float(n))

        return (lambda b, f=f: T.t_strlen(f(b))), mir_len
    tf = {"ucase": T.t_ucase, "lcase": T.t_lcase}[form]
    pyf = {"ucase": str.upper, "lcase": str.lower}[form]

    def mir_case(m, g=g, pyf=pyf):
        return ("str", pyf(rend(g(m))), 0.0)

    return (lambda b, f=f, tf=tf: tf(f(b))), mir_case


def _bind_fuzz_case(spark, seed, gen):
    """Shared harness: random required+VALUES patterns, 1-2 chained
    binds from ``gen``, engine select() vs model_select + mirror."""
    from matcha_spark import Bind
    from matcha_spark.patterns import find_vars
    from matcha_spark.terms import to_term

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(1, 12))
    pats = [_rand_pattern(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.4:
        pats.append(
            Values(
                rng.choice(VARS),
                [rng.choice(POOL) for _ in range(rng.randint(0, 3))],
            )
        )
    allv = sorted(find_vars(pats))
    if not allv:
        pytest.skip("no vars generated")

    binds = []
    f1, g1 = gen(rng, allv)
    binds.append(("?e", f1, g1))
    if rng.random() < 0.5:
        f2, g2 = gen(rng, allv + ["?e"])
        binds.append(("?f", f2, g2))
    for bv, bf, _ in binds:
        pats.append(Bind(bv, bf))

    bind_vars = [bv for bv, _, _ in binds]
    order = allv + []
    rng.shuffle(order)
    pvars = order[: rng.randint(0, len(order))] + bind_vars

    wide = model_select(allv, pats[: len(pats) - len(binds)], db_rows)
    expected = set()
    for row in wide:
        m = {v: to_term(val)[:3] for v, val in zip(allv, row)}
        for bv, _, bg in binds:
            m[bv] = bg(m)
        expected.add(tuple(_mirror_decode(m[p]) if p in bind_vars else
                           _from_model(m[p]) for p in pvars))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert got_rows == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={pats}\npvars={pvars}"
    )


def _from_model(t):
    """Decode a mirrored PATTERN var (term triple built by to_term from
    a model value) back to the model value — inverse of to_term for the
    POOL kinds."""
    return _mirror_decode(t)


@pytest.mark.parametrize("seed", range(3000, 3020))
def test_bind_numeric_differential(spark, seed):
    """Random arithmetic Bind trees (chained; NULL-num error-as-absence
    over non-numeric vars) vs the Python mirror."""
    _bind_fuzz_case(spark, seed, _rand_num_bind_expr)


@pytest.mark.parametrize("seed", range(3100, 3120))
def test_bind_string_differential(spark, seed):
    """Random string Bind trees (render coalesce, 1-based substr,
    concat_ws separators, strlen int terms) vs the Python mirror."""
    _bind_fuzz_case(spark, seed, _rand_str_bind_expr)


@pytest.mark.parametrize("seed", range(3200, 3212))
def test_path_bind_expr_differential(spark, seed):
    """Random path expressions COMBINED with random string-bind trees
    over the path endpoints — the interaction surface (path solutions
    feeding computed vars) the fixed-substring path/bind test left
    unfuzzed."""
    from matcha_spark import Bind
    from matcha_spark.terms import to_term

    rng = random.Random(seed)
    db_rows = _rand_path_db(rng)
    path = _rand_path_expr(rng)
    f, g = _rand_str_bind_expr(rng, ["?a", "?b"])
    pats = [("?a", path, "?b"), Bind("?c", f)]
    pairs = _model_path_pairs(path, db_rows)
    expected = set()
    for a, b in pairs:
        m = {"?a": to_term(a)[:3], "?b": to_term(b)[:3]}
        expected.add((a, b, _mirror_decode(g(m))))

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(["?a", "?b", "?c"], pats, db)
    finally:
        db.unpersist()
    got_rows = {tuple(r) for r in (got or [])}
    assert got_rows == expected, (
        f"seed={seed}\ndb={db_rows}\npath={path!r}"
    )


@pytest.mark.parametrize("seed", range(3300, 3318))
def test_bind_optional_differential(spark, seed):
    """Bind × Optional interaction fuzz: binds evaluate on the
    required+VALUES solution set BEFORE optionals extend it (the
    documented clause order), so a bind var must be present on every
    row while optional-only vars carry unbound markers — the
    reconstruction/marker path with computed vars in the mix.  Mirror:
    model_select over required+optional patterns (the model knows no
    Bind), bind mirrors computed per-row from the required vars
    alone."""
    from matcha_spark import Bind
    from matcha_spark.patterns import find_vars
    from matcha_spark.terms import to_term

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(1, 12))
    base = [_rand_pattern(rng) for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.4:
        base.append(
            Values(
                rng.choice(VARS),
                [rng.choice(POOL) for _ in range(rng.randint(0, 3))],
            )
        )
    basev = sorted(find_vars(base))
    if not basev:
        pytest.skip("no base vars generated")
    gen = rng.choice([_rand_num_bind_expr, _rand_str_bind_expr])
    bf, bg = gen(rng, basev)
    opts = [Optional(_rand_patterns(rng, depth=1))
            for _ in range(rng.randint(1, 2))]
    pats = base + [Bind("?e", bf)] + opts

    allv = sorted(find_vars(base + opts))
    order = list(allv)
    rng.shuffle(order)
    pvars = order[: rng.randint(0, len(order))] + ["?e"]

    wide = model_select(allv, base + opts, db_rows)
    expected = set()
    for row in wide:
        vals = dict(zip(allv, row))
        m = {v: to_term(vals[v])[:3] for v in basev}
        e = _mirror_decode(bg(m))
        expected.add(
            tuple(e if p == "?e" else vals[p] for p in pvars)
        )

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == _blind(expected), (
        f"seed={seed}\ndb={db_rows}\npatterns={pats}\npvars={pvars}"
    )


@pytest.mark.parametrize("seed", range(3400, 3416))
def test_filter_string_predicate_differential(spark, seed):
    """String-predicate Filter fuzz (r14): t_strstarts / t_strends /
    t_contains over a random var — boolean termfns as FILTER
    predicates, mirrored with the same render-coalesce ('' for nil)
    the engine applies.  Complements the numeric Filter fuzzer, which
    covers the try_cast/ANSI side."""
    from matcha_spark import Filter
    from matcha_spark.functions import termfns as T
    from matcha_spark.patterns import find_vars
    from matcha_spark.terms import to_term

    rng = random.Random(seed)
    db_rows = _rand_db(rng, rng.randint(1, 12))
    pats = [_rand_pattern(rng) for _ in range(rng.randint(1, 3))]
    allv = sorted(find_vars(pats))
    if not allv:
        pytest.skip("no vars generated")
    fvar = rng.choice(allv)
    needle = rng.choice(["x", "k", "0", "1", "k1"])
    form = rng.choice(["starts", "ends", "contains"])
    tf = {"starts": T.t_strstarts, "ends": T.t_strends,
          "contains": T.t_contains}[form]
    pyf = {"starts": str.startswith, "ends": str.endswith,
           "contains": str.__contains__}[form]

    pats_f = list(pats)
    pats_f.insert(
        rng.randint(0, len(pats_f)),
        Filter(lambda v: tf(v[fvar], needle)),
    )
    order = list(allv)
    rng.shuffle(order)
    pvars = order[: rng.randint(1, len(order))]

    def rend(val):
        t = to_term(val)[:3]
        r = _mirror_render(t)
        return "" if r is None else r

    wide = model_select(allv, pats, db_rows)
    fidx = allv.index(fvar)
    expected = _blind(
        {
            tuple(r[allv.index(p)] for p in pvars)
            for r in wide
            if pyf(rend(r[fidx]), needle)
        }
    )

    db = TriplesDB.from_triples(spark, db_rows)
    try:
        got = select(pvars, pats_f, db)
    finally:
        db.unpersist()
    got_rows = set()
    if got is not None:
        for r in got if len(pvars) > 1 else [(g,) for g in got]:
            got_rows.add(r if isinstance(r, tuple) else (r,))
    assert _blind(got_rows) == expected, (
        f"seed={seed}\ndb={db_rows}\npatterns={pats_f}\npvars={pvars}\n"
        f"fvar={fvar} form={form} needle={needle!r}"
    )
