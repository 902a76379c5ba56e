"""Property-path battery: Seq / Alt / Inv / OneOrMore / ZeroOrMore /
ZeroOrOne as compiler-level pattern forms (SPARQL 1.1 paths — a
Spark-native extension; the reference has none, SURVEY §2.5).

Graph under test::

    :a -knows-> :b -knows-> :c -knows-> :d      (chain)
    :c -knows-> :a                               (cycle back)
    :a -likes-> :x                               (side edge)
    :b -name-> "bee"                             (literal leaf)
"""

import pytest

from matcha_spark.db import TriplesDB
from matcha_spark.errors import InvalidBgpError
from matcha_spark.patterns import Alt, Inv, OneOrMore, Seq, ZeroOrMore, ZeroOrOne
from matcha_spark.query import select
from matcha_spark.terms import kw

A, B, C, D, X = kw(":a"), kw(":b"), kw(":c"), kw(":d"), kw(":x")
KNOWS, LIKES, NAME = kw(":knows"), kw(":likes"), kw(":name")

TRIPLES = [
    (A, KNOWS, B),
    (B, KNOWS, C),
    (C, KNOWS, D),
    (C, KNOWS, A),
    (A, LIKES, X),
    (B, NAME, "bee"),
]


@pytest.fixture(scope="module")
def db(spark):
    return TriplesDB.from_triples(spark, TRIPLES)


def _pairs(db, path):
    rows = select(["?s", "?o"], [("?s", path, "?o")], db) or []
    return {tuple(r) for r in rows}


def test_seq_two_hop(db):
    assert _pairs(db, Seq(KNOWS, KNOWS)) == {(A, C), (B, D), (B, A), (C, B)}


def test_seq_three_hop_and_mixed_leaf(db):
    # knows/knows/name reaches the literal leaf two hops out
    assert _pairs(db, Seq(KNOWS, KNOWS, NAME)) == {(C, "bee")}


def test_alt_union(db):
    got = _pairs(db, Alt(KNOWS, LIKES))
    assert got == {(A, B), (B, C), (C, D), (C, A), (A, X)}


def test_inv(db):
    assert _pairs(db, Inv(KNOWS)) == {(B, A), (C, B), (D, C), (A, C)}
    # ^p/p = siblings-through-shared-object (incl. self)
    got = _pairs(db, Seq(Inv(KNOWS), KNOWS))
    assert (D, A) in got and (A, D) in got  # both known by :c


def test_one_or_more_closure_with_cycle(db):
    got = _pairs(db, OneOrMore(KNOWS))
    # a,b,c sit on the cycle: each reaches a,b,c,d
    for s in (A, B, C):
        assert {(s, A), (s, B), (s, C), (s, D)} <= got
    assert not any(p[0] == D for p in got)  # d has no out-edges
    assert len(got) == 12


def test_one_or_more_matches_transitive_closure_operator(db, spark):
    from pyspark.sql import functions as F

    from matcha_spark.operators.graph import path_edges, transitive_closure
    from matcha_spark.terms import term_lit

    edges = db.df.where(F.col("p") == term_lit(KNOWS)).select("s", "o")
    want = {(r.s["lex"], r.o["lex"]) for r in transitive_closure(edges, "s", "o").collect()}
    got = {(r.s["lex"], r.o["lex"]) for r in path_edges(db, OneOrMore(KNOWS)).collect()}
    assert got == want


def test_zero_or_more_includes_identity_on_mentioned_nodes(db):
    got = _pairs(db, ZeroOrMore(KNOWS))
    # every mentioned node (subjects, objects, even the literal) self-pairs
    for n in (A, B, C, D, X, "bee"):
        assert (n, n) in got
    assert (A, D) in got  # closure pairs present too
    # 12 closure pairs + 6 identity pairs − 3 overlaps (cycle self-pairs)
    assert len(got) == 15


def test_zero_or_one(db):
    got = _pairs(db, ZeroOrOne(KNOWS))
    assert got == {(A, B), (B, C), (C, D), (C, A)} | {
        (n, n) for n in (A, B, C, D, X, "bee")
    }


def test_ground_endpoints_and_bgp_join(db):
    # ground object: who reaches :d in one-or-more hops?
    rows = select(["?s"], [("?s", OneOrMore(KNOWS), D)], db)
    assert set(rows) == {A, B, C}
    # path pattern joins with plain patterns on shared vars
    rows = select(
        ["?n"],
        [("?s", LIKES, X), ("?s", Seq(KNOWS, NAME), "?n")],
        db,
    )
    assert rows == ["bee"]
    # both ends ground: acts as an existence guard
    assert select(["?v"], [(A, OneOrMore(KNOWS), D), (B, NAME, "?v")], db) == ["bee"]
    assert select(["?v"], [(D, OneOrMore(KNOWS), A), (B, NAME, "?v")], db) is None


def test_ground_endpoint_closures_are_seeded(db):
    """r09: a closure with a ground endpoint must take the
    seeded-frontier evaluation (O(reachable)), not the all-pairs
    closure + filter (O(V²)) — visible in the plan as a
    ``seeded_reach_*`` scan path; var-var closures keep all-pairs."""
    from matcha_spark.query import explain_query

    plan = explain_query([(A, OneOrMore(KNOWS), "?x")], db)
    assert "seeded_reach_" in plan
    # ground OBJECT seeds from the reversed edge set
    plan = explain_query([("?s", OneOrMore(KNOWS), D)], db)
    assert "seeded_reach_" in plan
    # an Inv wrapper unwraps onto the opposite endpoint
    plan = explain_query([("?s", Inv(OneOrMore(KNOWS)), A)], db)
    assert "seeded_reach_" in plan
    # closures NESTED in composite paths seed too (r09 generalization):
    # the seed set threads through the Seq into the closure
    plan = explain_query([(A, Seq(KNOWS, OneOrMore(KNOWS)), "?x")], db)
    assert "seeded_reach_" in plan
    # both ends variable: compositional all-pairs, NOT seeded
    plan = explain_query([("?s", OneOrMore(KNOWS), "?o")], db)
    assert "seeded_reach_" not in plan
    # closure-free path with a ground endpoint: Catalyst pushes the
    # filter itself — no seeded machinery (and no parquet rounds)
    plan = explain_query([(A, Seq(KNOWS, KNOWS), "?x")], db)
    assert "seeded_reach_" not in plan


def test_ground_endpoint_seeded_semantics(db):
    """Seeded results must be indistinguishable from the all-pairs
    form across every closure flavor and endpoint side."""
    # OneOrMore, ground subject: forward cone (cycle re-reaches :a)
    rows = select(["?x"], [(A, OneOrMore(KNOWS), "?x")], db)
    assert set(rows) == {B, C, D, A}
    # ZeroOrMore, ground subject: cone ∪ the zero-length self-pair
    rows = select(["?x"], [(A, ZeroOrMore(KNOWS), "?x")], db)
    assert set(rows) == {A, B, C, D}
    # ZeroOrMore, ground object: ancestors ∪ self
    rows = select(["?s"], [("?s", ZeroOrMore(KNOWS), D)], db)
    assert set(rows) == {A, B, C, D}
    # dead-end seed: :x has no outgoing knows edges -> only itself (p*)
    rows = select(["?o"], [(X, ZeroOrMore(KNOWS), "?o")], db)
    assert set(rows) == {X}
    assert select(["?o"], [(X, OneOrMore(KNOWS), "?o")], db) is None
    # unmentioned seed: no identity pair for p* either
    assert select(["?o"], [(kw(":ghost"), ZeroOrMore(KNOWS), "?o")], db) is None
    # Inv(OneOrMore) ground object == forward cone from that node
    rows = select(["?s"], [("?s", Inv(OneOrMore(KNOWS)), A)], db)
    assert set(rows) == {B, C, D, A}
    # seeded closure of a COMPOSITE inner path (knows/knows from :a)
    rows = select(["?x"], [(A, OneOrMore(Seq(KNOWS, KNOWS)), "?x")], db)
    assert set(rows) == {C, A, B, D}
    # closure NESTED inside a Seq: seed threads through the first hop
    rows = select(["?x"], [(A, Seq(KNOWS, OneOrMore(KNOWS)), "?x")], db)
    assert set(rows) == {A, B, C, D}
    # nested closure, ground OBJECT: who reaches :d via knows then knows+?
    rows = select(["?x"], [("?x", Seq(KNOWS, OneOrMore(KNOWS)), D)], db)
    assert set(rows) == {A, B, C}
    # Alt of (closure | plain) with ground subject
    rows = select(["?x"], [(A, Alt(OneOrMore(KNOWS), LIKES), "?x")], db)
    assert set(rows) == {B, C, D, A, X}
    # ZeroOrOne over a closure, ground subject: cone ∪ self
    rows = select(["?x"], [(A, ZeroOrOne(OneOrMore(KNOWS)), "?x")], db)
    assert set(rows) == {A, B, C, D}


def test_repeated_var_on_cycle(db):
    # (?x knows+ ?x) — exactly the cycle members
    rows = select(["?x"], [("?x", OneOrMore(KNOWS), "?x")], db)
    assert set(rows) == {A, B, C}


def test_selective_var_anchor_seeds_closure(db):
    """r10: a var-endpoint closure whose endpoint var is bound by a
    selective prior pattern defers to the end of the join tree and
    evaluates seeded from the computed anchor set
    (``_join_deferred_closure``) — visible as a ``seeded_reach_*``
    scan; an un-anchored var-var closure stays all-pairs."""
    from matcha_spark.query import explain_query

    # object endpoint anchored via the name pattern → seeded backward
    plan = explain_query(
        [("?n", NAME, "bee"), ("?s", OneOrMore(KNOWS), "?n")], db
    )
    assert "seeded_reach_" in plan
    # subject endpoint anchored → seeded forward
    plan = explain_query(
        [("?s", LIKES, X), ("?s", OneOrMore(KNOWS), "?x")], db
    )
    assert "seeded_reach_" in plan
    # no anchor pattern: classic all-pairs
    plan = explain_query([("?s", OneOrMore(KNOWS), "?o")], db)
    assert "seeded_reach_" not in plan


def test_relative_seeding_gate(db, monkeypatch):
    """r11 (verdict ask #8): the seeding gate is RELATIVE — an anchor
    whose estimate exceeds the absolute floor still seeds as long as
    it is within the closure's own edge-set estimate.  Zeroing the
    floor models the flagged scenario (anchor est 10,001 vs a much
    larger graph) at unit scale: under the old absolute gate no
    anchor would ever pass; under the relative gate the selective
    anchor (est ≤ knows-edge count) must still seed."""
    from matcha_spark.plans import compiler as _compiler
    from matcha_spark.query import explain_query

    monkeypatch.setattr(_compiler, "SEEDED_FRONTIER_EST", 0.0)
    plan = explain_query(
        [("?n", NAME, "bee"), ("?s", OneOrMore(KNOWS), "?n")], db
    )
    assert "seeded_reach_" in plan
    # and the seeded result is still correct
    rows = select(
        ["?s"], [("?n", NAME, "bee"), ("?s", OneOrMore(KNOWS), "?n")], db
    )
    assert set(rows) == {A, B, C}


def test_selective_var_anchor_semantics(db):
    # who reaches the node named "bee" (= :b)?  :b itself re-reaches
    # through the b→c→a→b cycle
    rows = select(
        ["?s"], [("?n", NAME, "bee"), ("?s", OneOrMore(KNOWS), "?n")], db
    )
    assert set(rows) == {A, B, C}
    # subject-side anchor: ?s = :a (likes :x), forward cone
    rows = select(
        ["?x"], [("?s", LIKES, X), ("?s", OneOrMore(KNOWS), "?x")], db
    )
    assert set(rows) == {A, B, C, D}
    # BOTH endpoints bound: seeded pair set joins on both columns
    rows = select(
        ["?s"],
        [("?s", LIKES, X), ("?n", NAME, "bee"), ("?s", OneOrMore(KNOWS), "?n")],
        db,
    )
    assert rows == [A]
    # ZeroOrMore through an anchored var keeps the identity pair
    rows = select(
        ["?s"], [("?n", NAME, "bee"), ("?s", ZeroOrMore(KNOWS), "?n")], db
    )
    assert set(rows) == {A, B, C}
    # anchor set empty → no solutions, and no crash
    assert (
        select(["?s"], [("?n", NAME, "nope"), ("?s", OneOrMore(KNOWS), "?n")], db)
        is None
    )
    # Inv-wrapped closure defers too and flips the walk direction:
    # ?s ^(knows+) ?n ⟺ ?n knows+ ?s — everything :b reaches
    rows = select(
        ["?s"],
        [("?n", NAME, "bee"), ("?s", Inv(OneOrMore(KNOWS)), "?n")],
        db,
    )
    assert set(rows) == {A, B, C, D}


def test_nested_composition(db):
    # (^likes)/knows+ : from :x back to :a, then anywhere the closure goes
    got = _pairs(db, Seq(Inv(LIKES), OneOrMore(KNOWS)))
    assert got == {(X, A), (X, B), (X, C), (X, D)}


def test_alt_of_seq_dedups_derivations(db):
    # both branches derive (a, c): result is a set, one row
    path = Alt(Seq(KNOWS, KNOWS), Seq(KNOWS, KNOWS))
    rows = select(["?s", "?o"], [("?s", path, "?o")], db)
    assert list(map(tuple, rows)).count((A, C)) == 1


def test_path_validation_errors(db):
    with pytest.raises(InvalidBgpError):
        select(["?o"], [(Seq(KNOWS, KNOWS), KNOWS, "?o")], db)  # path in subject
    with pytest.raises(InvalidBgpError):
        select(["?o"], [("?s", Seq(KNOWS, "?v"), "?o")], db)  # var inside path
    with pytest.raises(InvalidBgpError):
        Seq(KNOWS)  # sequence needs >= 2 steps
    with pytest.raises(InvalidBgpError):
        Alt()


def test_negated_property_set(db):
    from matcha_spark.patterns import NegSet

    # every edge that is not :knows
    got = _pairs(db, NegSet(KNOWS))
    assert got == {(A, X), (B, "bee")}
    # !(knows|likes) leaves only the name edge
    assert _pairs(db, NegSet(KNOWS, LIKES)) == {(B, "bee")}
    # composes with other operators: one non-name hop then a knows hop
    assert _pairs(db, Seq(NegSet(NAME), KNOWS)) == {(A, C), (B, D), (B, A), (C, B)}
    with pytest.raises(InvalidBgpError):
        NegSet()
    with pytest.raises(InvalidBgpError):
        select(["?o"], [("?s", NegSet(Seq(KNOWS, KNOWS)), "?o")], db)


def test_path_inside_optional(db):
    """Paths compose with OPTIONAL blocks (the block recurses into the
    same compiler): reach set is optional per subject."""
    from matcha_spark.patterns import Optional as Opt

    rows = select(
        ["?s", "?r"],
        [
            ("?s", KNOWS, "?t"),  # subjects with an out-edge: a, b, c
            Opt([("?s", Seq(KNOWS, KNOWS, KNOWS, NAME), "?r")]),
        ],
        db,
    )
    from matcha_spark.terms import Unbound

    got = {tuple(r) for r in rows}
    # knows³ self-loops land only b back on itself, so only b reaches
    # the name leaf; a and c keep unbound markers (optional never drops)
    assert {(s, r) for s, r in got if not isinstance(r, Unbound)} == {(B, "bee")}
    assert {s for s, _ in got} == {A, B, C}


def test_path_inside_optional_and_negation(spark):
    """Path patterns compose inside OPTIONAL and NOT EXISTS blocks —
    clause types recurse through the same compiler."""
    from matcha_spark import NotExists, Optional, TriplesDB, kw, select
    from matcha_spark.patterns import OneOrMore, Seq

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("next"), kw("b")),
            (kw("b"), kw("next"), kw("c")),
            (kw("a"), kw("tag"), "root"),
            (kw("c"), kw("tag"), "leaf"),
            (kw("x"), kw("tag"), "isolated"),
        ],
    )
    # OPTIONAL path: every tagged node, plus its closure-reachable end
    res = select(
        ["?n", "?reach"],
        [
            ("?n", kw("tag"), "?t"),
            Optional([("?n", OneOrMore(kw("next")), "?reach")]),
        ],
        db,
    )
    got = {(str(a), str(b)) for a, b in res}
    assert (":a", ":b") in got and (":a", ":c") in got
    assert any(a == ":x" for a, _ in got)  # isolated keeps an unbound reach
    # NOT EXISTS over a path: tagged nodes with NO two-step successor
    res2 = select(
        ["?n"],
        [
            ("?n", kw("tag"), "?t"),
            NotExists([("?n", Seq(kw("next"), kw("next")), "?y")]),
        ],
        db,
    )
    assert sorted(str(n) for n in res2) == [":c", ":x"]


def test_construct_and_agg_over_paths(spark):
    """Paths feed the OTHER verbs too: construct templates over a
    closure, and select_agg grouping path endpoints."""
    from matcha_spark import TriplesDB, construct, kw, select_agg
    from matcha_spark.patterns import OneOrMore

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("next"), kw("b")),
            (kw("b"), kw("next"), kw("c")),
            (kw("c"), kw("next"), kw("d")),
        ],
    )
    # CONSTRUCT a reachability edge per closure pair
    out = construct(
        ("?x", kw("reaches"), "?y"),
        [("?x", OneOrMore(kw("next")), "?y")],
        db,
    )
    assert len(out) == 6  # a->{b,c,d}, b->{c,d}, c->{d}
    # aggregate: out-reach count per source node
    agg = select_agg(
        ["?x"],
        {"n": ("count", "?y")},
        [("?x", OneOrMore(kw("next")), "?y")],
        db,
    ).collect()
    got = {r["?x"]["lex"]: r["n"] for r in agg}
    assert got == {"a": 3, "b": 2, "c": 1}
