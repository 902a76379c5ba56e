"""Port of the reference's select/ask/values tests
(test/grafter/matcha/alpha_test.clj:47-110, 339-448)."""

import pytest

from matcha_spark import (
    InvalidBgpError,
    InvalidValuesError,
    TriplesDB,
    Values,
    ask,
    select,
    select_1,
)

from .fixtures import (
    FOAF_KNOWS,
    RDFS_LABEL,
    abc_db,
    friends,
    friends_vectors,
    julie,
    katie,
    martin,
    nil_db,
    rick,
)
from .util import as_set


@pytest.fixture(scope="module")
def friends_db(spark):
    return TriplesDB.from_triples(spark, friends)


@pytest.fixture(scope="module")
def friends_vectors_db(spark):
    return TriplesDB.from_triples(spark, friends_vectors)


def test_names_rick_knows(friends_db):
    # README flagship / test:58-65
    res = select(
        ["?name"],
        [(rick, FOAF_KNOWS, "?p"), ("?p", RDFS_LABEL, "?name")],
        friends_db,
    )
    assert set(res) == {"Martin", "Katie"}


def test_select_df_solution_modifiers(friends_db):
    """r09: ORDER BY / LIMIT / OFFSET on plain select_df — canonical
    term order per column, desc flips, offset needs an order, and a
    limit plans TakeOrdered."""
    import pytest as _pytest

    from matcha_spark.query import select_df
    from matcha_spark.terms import from_term

    pats = [("?p", RDFS_LABEL, "?name")]
    names = [
        from_term(r["?name"])
        for r in select_df(
            ["?name"], pats, friends_db, order_by=["?name"]
        ).collect()
    ]
    assert names == sorted(names) and len(names) >= 3
    desc = [
        from_term(r["?name"])
        for r in select_df(
            ["?name"], pats, friends_db, order_by=["-?name"]
        ).collect()
    ]
    assert desc == list(reversed(names))
    top2 = select_df(
        ["?name"], pats, friends_db, order_by=["-?name"], limit=2
    )
    assert [from_term(r["?name"]) for r in top2.collect()] == desc[:2]
    assert "TakeOrdered" in top2._jdf.queryExecution().executedPlan().toString()
    paged = select_df(
        ["?name"], pats, friends_db, order_by=["?name"], offset=1, limit=2
    ).collect()
    assert [from_term(r["?name"]) for r in paged] == names[1:3]
    with _pytest.raises(ValueError):
        select_df(["?name"], pats, friends_db, offset=1)
    with _pytest.raises(ValueError):
        select_df(["?name"], pats, friends_db, order_by=["?absent"])


def test_friend_of_friend_chain(friends_db):
    # test:75-81: 3-pattern chain
    res = select(
        ["?p1", "?p2", "?p3"],
        [
            ("?p1", FOAF_KNOWS, "?p2"),
            ("?p2", FOAF_KNOWS, "?p3"),
        ],
        friends_db,
    )
    assert as_set(res) == {(rick, katie, julie)}


def test_select_all_vars_inferred(friends_db):
    # 1-arity select: project all vars in pattern order
    q = select([("?s", "?p", "?o")])
    res = q(friends_db)
    assert as_set(res) == {tuple(t) for t in friends}


def test_keyword_db_same_shape(friends_vectors_db):
    from matcha_spark import kw

    res = select(
        ["?name"],
        [(kw("rick"), kw("foaf/knows"), "?p"), ("?p", kw("rdfs/label"), "?name")],
        friends_vectors_db,
    )
    assert set(res) == {"Martin", "Katie"}


def test_empty_result_is_none(spark):
    res = select(["?p", "?o"], [(kw_not_matching(), "?p", "?o")], abc_db)
    assert res is None


def kw_not_matching():
    from matcha_spark import kw

    return kw("not-a-matching-query")


def test_nil_is_matchable(spark):
    # test:133-138: nil subject is a value, not an absence
    from matcha_spark import kw

    res = select(["?label"], [(None, kw("label"), "?label")], nil_db)
    assert res == ["nil label"]


def test_repeated_var_in_pattern(spark):
    from matcha_spark import kw

    db = [(kw("x"), kw("x"), kw("y")), (kw("a"), kw("b"), kw("c"))]
    res = select(["?s"], [("?s", "?s", "?o")], db)
    assert res == [kw("x")]


def test_scalar_unwrap_single_var(friends_db):
    res = select(["?name"], [(rick, RDFS_LABEL, "?name")], friends_db)
    assert res == ["Rick"]


def test_select_1(friends_db):
    res = select_1(["?name"], [(rick, RDFS_LABEL, "?name")], friends_db)
    assert res == "Rick"
    assert select_1(["?x"], [(rick, kw_not_matching(), "?x")], friends_db) is None


def test_curried_arities_equiv(friends_db):
    pats = [(rick, FOAF_KNOWS, "?p"), ("?p", RDFS_LABEL, "?name")]
    assert select(["?name"], pats)(friends_db) == select(["?name"], pats, friends_db)
    assert ask(pats)(friends_db) == ask(pats, friends_db)


def test_ask(friends_db):
    assert ask([(rick, FOAF_KNOWS, "?p")], friends_db) is True
    assert ask([(julie, FOAF_KNOWS, "?p")], friends_db) is False


def test_cross_join_disconnected_patterns(spark):
    from matcha_spark import kw

    db = [(kw("a"), kw("p"), 1), (kw("b"), kw("q"), 2)]
    res = select(["?x", "?y"], [("?s1", kw("p"), "?x"), ("?s2", kw("q"), "?y")], db)
    assert as_set(res) == {(1, 2)}


def test_all_ground_pattern_guard(spark):
    from matcha_spark import kw

    db = [(kw("a"), kw("p"), 1), (kw("b"), kw("q"), 2)]
    # matching ground pattern: acts as existence filter
    res = select(["?x"], [("?s", kw("p"), "?x"), (kw("b"), kw("q"), 2)], db)
    assert res == [1]
    # non-matching ground pattern annihilates
    assert select(["?x"], [("?s", kw("p"), "?x"), (kw("b"), kw("q"), 3)], db) is None


# -- values (test:400-448) --------------------------------------------------


def test_values_basic(friends_db):
    people = {rick}
    res = select(
        ["?name"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            ("?o", RDFS_LABEL, "?name"),
            Values("?person", people),
        ],
        friends_db,
    )
    assert set(res) == {"Martin", "Katie"}


def test_values_two_subjects(friends_db):
    res = select(
        ["?name"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            ("?o", RDFS_LABEL, "?name"),
            Values("?person", {rick, katie}),
        ],
        friends_db,
    )
    assert set(res) == {"Martin", "Katie", "Julie"}


def test_values_double_constraint(friends_db):
    res = select(
        ["?name"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            Values("?person", [rick, katie]),
            ("?o", RDFS_LABEL, "?name"),
            Values("?name", {"Julie"}),
        ],
        friends_db,
    )
    assert set(res) == {"Julie"}


def test_values_nil_yields_nothing(friends_db):
    res = select(
        ["?name"],
        [("?person", FOAF_KNOWS, "?o"), ("?o", RDFS_LABEL, "?name"), Values("?person", None)],
        friends_db,
    )
    assert res is None


def test_values_invalid_rhs(friends_db):
    with pytest.raises(InvalidValuesError):
        select(
            ["?name"],
            [("?person", FOAF_KNOWS, "?o"), Values("?person", rick)],
            friends_db,
        )
    with pytest.raises(InvalidValuesError):
        select(
            ["?name"],
            [("?person", FOAF_KNOWS, "?o"), Values("?person", 1)],
            friends_db,
        )


def test_values_unbound_var_binds(friends_db):
    # values var not bound by any pattern: enumerates the collection
    res = select(
        ["?name", "?tag"],
        [(rick, RDFS_LABEL, "?name"), Values("?tag", [1, 2])],
        friends_db,
    )
    assert as_set(res) == {("Rick", 1), ("Rick", 2)}


# -- invalid BGPs (test:274-360) --------------------------------------------


def test_invalid_bgp_collection_element(friends_db):
    with pytest.raises(InvalidBgpError):
        select(["?o"], [([1, 2, 3], RDFS_LABEL, "?o")], friends_db)
    with pytest.raises(InvalidBgpError):
        select(["?o"], [(rick, RDFS_LABEL, {"a": 1})], friends_db)


def test_literal_escape_hatch(spark):
    # a constant string that itself starts with '?' must not parse as a var
    from matcha_spark import Literal, kw

    db = [(kw("a"), kw("p"), "?not-a-var"), (kw("b"), kw("p"), "x")]
    res = select(["?s"], [("?s", kw("p"), Literal("?not-a-var"))], db)
    assert res == [kw("a")]


def test_select_1_plan_is_bounded(spark):
    """select_1 must compile to a plan-level top-1 (TakeOrderedAndProject),
    not a full collect + driver sort, and agree with select()[0]."""
    from pyspark.sql import functions as F

    from matcha_spark import kw
    from matcha_spark.query import _solve_projected

    db = TriplesDB.from_triples(
        spark, [(kw(f"s{i}"), kw("p"), i) for i in range(100)]
    )
    pats = [("?s", kw("p"), "?o")]
    out = _solve_projected(db, pats, ["?s", "?o"])
    plan = (
        out.orderBy(F.col("?s"), F.col("?o")).limit(1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    first = select_1(["?s", "?o"], pats, db)
    full = select(["?s", "?o"], pats, db)
    assert first == full[0]
    db.unpersist()


def test_filter_clause(spark):
    from matcha_spark import Filter, kw
    from matcha_spark.functions.termcols import lex_as

    db = TriplesDB.from_triples(
        spark, [(kw(f"s{i}"), kw("score"), i) for i in range(10)]
    )
    res = select(
        ["?s", "?v"],
        [
            ("?s", kw("score"), "?v"),
            Filter(lambda v: lex_as(v["?v"], "bigint") >= 7),
        ],
        db,
    )
    assert sorted(r[1] for r in res) == [7, 8, 9]
    # filter referencing a never-usable shape: non-callable rejected
    with pytest.raises(InvalidBgpError):
        from matcha_spark.patterns import Filter as _F

        _F("not callable")
    db.unpersist()


def test_not_exists_and_minus(spark):
    from matcha_spark import Filter, Minus, NotExists, kw

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("type"), "person"),
            (kw("b"), kw("type"), "person"),
            (kw("a"), kw("banned"), True),
            (kw("x"), kw("unrelated"), 1),
        ],
    )
    # correlated NOT EXISTS: persons without a banned edge
    res = select(
        ["?s"],
        [("?s", kw("type"), "person"), NotExists([("?s", kw("banned"), "?b")])],
        db,
    )
    assert res == [kw("b")]
    # MINUS behaves identically when vars are shared
    res2 = select(
        ["?s"],
        [("?s", kw("type"), "person"), Minus([("?s", kw("banned"), "?b")])],
        db,
    )
    assert res2 == [kw("b")]
    # uncorrelated: NOT EXISTS empties (the block matches something),
    # MINUS keeps everything (SPARQL dom-disjoint rule)
    assert (
        select(["?s"], [("?s", kw("type"), "person"), NotExists([("?z", kw("unrelated"), 1)])], db)
        is None
    )
    assert set(
        select(["?s"], [("?s", kw("type"), "person"), Minus([("?z", kw("unrelated"), 1)])], db)
    ) == {kw("a"), kw("b")}
    db.unpersist()


# ---------------------------------------------------------------------------
# bag (multiset) semantics — the reference's run* enumeration keeps one
# row per derivation; the engine's default canonical set semantics is the
# documented deviation (PARITY.md).  bag_semantics=True closes it.
# ---------------------------------------------------------------------------


def _bag_rows(spark, pvars, patterns, triples, bag=True):
    from matcha_spark.db import index_triples
    from matcha_spark.query import select_df
    from matcha_spark.terms import from_term

    db = index_triples(spark, triples)
    df = select_df(pvars, patterns, db, bag_semantics=bag)
    out = [tuple(from_term(r[v]) for v in df.columns) for r in df.collect()]
    db.unpersist()
    return sorted(out, key=repr)


def test_bag_semantics_keeps_duplicate_derivations(spark):
    """Two derivation paths for the same projected row → two rows under
    bag semantics, one under the default set semantics."""
    from matcha_spark.terms import kw

    triples = [
        (kw(":a"), kw(":p"), kw(":b")),
        (kw(":a"), kw(":q"), kw(":b")),
    ]
    pat = [("?s", "?p1", "?o"), ("?s", "?p2", "?o")]
    bag = _bag_rows(spark, ["?s", "?o"], pat, triples, bag=True)
    assert len(bag) == 4  # (p,p) (p,q) (q,p) (q,q)
    st = _bag_rows(spark, ["?s", "?o"], pat, triples, bag=False)
    assert len(st) == 1


def test_bag_semantics_matches_model_on_fixture(spark):
    """Differential: engine bag multiset == pure-Python reference model
    bag multiset on a crafted fixture (joins + values)."""
    from tests.model import model_select_bag
    from matcha_spark.terms import kw

    triples = [
        (kw(":r"), kw(":knows"), kw(":m")),
        (kw(":r"), kw(":knows"), kw(":s")),
        (kw(":m"), kw(":knows"), kw(":s")),
        (kw(":r"), kw(":age"), 60),
        (kw(":m"), kw(":age"), 14),
    ]
    pat = [("?a", kw(":knows"), "?b"), ("?a", kw(":age"), "?n")]
    got = _bag_rows(spark, ["?a", "?n"], pat, triples, bag=True)
    want = sorted(model_select_bag(["?a", "?n"], pat, triples), key=repr)
    assert got == want
    # the same fixture under set semantics collapses the (:r, 60) pair
    assert len(got) == 3 and len(_bag_rows(spark, ["?a", "?n"], pat, triples, bag=False)) == 2


def test_bag_semantics_optional_collects_without_distinct(spark):
    """Optional regroup under bag: duplicate optional values survive
    (collect_list), matching the model's no-distinct collection."""
    from tests.model import model_select_bag
    from matcha_spark.patterns import Optional as Opt
    from matcha_spark.terms import kw

    triples = [
        (kw(":r"), kw(":type"), kw(":person")),
        (kw(":m"), kw(":type"), kw(":person")),
        (kw(":r"), kw(":likes"), kw(":pizza")),
        (kw(":r"), kw(":eats"), kw(":pizza")),
    ]
    pat = [
        ("?s", kw(":type"), kw(":person")),
        Opt([("?s", "?how", kw(":pizza")), ("?s", "?how2", "?x")]),
    ]
    pv = ["?s", "?x"]
    got = _bag_rows(spark, pv, pat, triples, bag=True)
    want_raw = model_select_bag(pv, pat, triples)

    def norm(rows):
        # marker-blind: unbound markers (engine) / UNBOUND (model) → None
        from matcha_spark.terms import Unbound

        out = []
        for r in rows:
            out.append(tuple(
                None if (isinstance(v, Unbound) or v == "<unbound>") else v for v in r
            ))
        return sorted(out, key=repr)

    assert norm(got) == norm(want_raw)


# ---------------------------------------------------------------------------
# select_agg (SPARQL 1.1-style GROUP BY + aggregates — Spark extension)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def agg_db(spark):
    from matcha_spark import kw

    trips = []
    for i in range(6):
        trips.append((kw(f"item{i}"), kw("cat"), f"c{i % 2}"))
        trips.append((kw(f"item{i}"), kw("size"), i + 1))
        trips.append((kw(f"item{i}"), kw("tag"), f"t{i % 3}"))
    # item6: category but NO size (exercises bound-only counting via optional)
    trips.append((kw("item6"), kw("cat"), "c0"))
    # item7: non-numeric 'size' (ignored by numeric aggregates)
    trips.append((kw("item7"), kw("cat"), "c1"))
    trips.append((kw("item7"), kw("size"), "not-a-number"))
    return TriplesDB.from_triples(spark, trips)


def _agg_rows(db, aggs, patterns, group=("?cat",), **kw_):
    from matcha_spark import select_agg
    from matcha_spark.functions.termcols import lex
    from pyspark.sql import functions as F

    out = select_agg(list(group), aggs, patterns, db, **kw_)
    cols = [lex(F.col(f"`{g}`")).alias(g[1:]) for g in group] + [
        F.col(k) for k in aggs
    ]
    return {r[0]: r for r in out.select(*cols).collect()}


def test_select_agg_numeric_ops(agg_db):
    from matcha_spark import kw

    rows = _agg_rows(
        agg_db,
        {"n": ("count", "?i"), "total": ("sum", "?sz"),
         "mean": ("avg", "?sz"), "lo": ("min", "?sz"), "hi": ("max", "?sz")},
        [("?i", kw("cat"), "?cat"), ("?i", kw("size"), "?sz")],
    )
    # c0: items 0,2,4 (sizes 1,3,5); item6 has no size triple -> no solution
    # c1: items 1,3,5 (sizes 2,4,6) + item7 (non-numeric size, ignored
    #     by numeric aggs but still a solution row for count)
    assert rows["c0"].n == 3 and rows["c0"].total == 9.0
    assert rows["c0"].lo == 1.0 and rows["c0"].hi == 5.0 and rows["c0"].mean == 3.0
    assert rows["c1"].n == 4  # count counts bound terms, numeric or not
    assert rows["c1"].total == 12.0 and rows["c1"].mean == 4.0


def test_select_agg_count_star_and_optional_unbound(agg_db):
    from matcha_spark import Optional as Opt, kw

    rows = _agg_rows(
        agg_db,
        {"all_rows": ("count", None), "with_size": ("count", "?sz")},
        [("?i", kw("cat"), "?cat"), Opt([("?i", kw("size"), "?sz")])],
    )
    # c0 has 4 items (item6 sizeless -> unbound marker, excluded from
    # count(?sz) but present in COUNT(*))
    assert rows["c0"].all_rows == 4 and rows["c0"].with_size == 3
    assert rows["c1"].all_rows == 4 and rows["c1"].with_size == 4


def test_select_agg_concat_sample_distinct(agg_db):
    from matcha_spark import kw

    rows = _agg_rows(
        agg_db,
        {
            "tags": ("group_concat", "?t"),
            "utags": ("group_concat_distinct", "?t"),
            "n_tags": ("count_distinct", "?t"),
            "first_item": ("sample", "?i"),
        },
        [("?i", kw("cat"), "?cat"), ("?i", kw("tag"), "?t")],
        concat_sep=",",
    )
    assert rows["c0"].tags == "t0,t1,t2"  # sorted multiset
    assert rows["c1"].tags == "t0,t1,t2"
    assert rows["c0"].utags == "t0,t1,t2" and rows["c0"].n_tags == 3
    # sample = canonical-least term; items are kw terms -> item0 / item1
    assert rows["c0"].first_item.lex == "item0"
    assert rows["c1"].first_item.lex == "item1"


def test_select_agg_global_group_and_curried(agg_db):
    from matcha_spark import kw, select_agg

    q = select_agg([], {"n": ("count", None), "total": ("sum", "?sz")},
                   [("?i", kw("size"), "?sz")])
    out = q(agg_db).collect()  # curried form
    assert len(out) == 1
    assert out[0].n == 7  # six numeric + one string size triple
    assert out[0].total == 21.0


def test_select_agg_bag_multiplicity(spark):
    """Aggregates see the solution MULTISET: a value reachable through
    two derivations counts twice (SPARQL §11 semantics)."""
    from matcha_spark import kw, select_agg

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("likes"), kw("x")),
            (kw("b"), kw("likes"), kw("x")),
            (kw("x"), kw("score"), 10),
        ],
    )
    out = select_agg(
        [], {"total": ("sum", "?s"), "n": ("count", "?s")},
        [("?who", kw("likes"), "?x"), ("?x", kw("score"), "?s")], db
    ).collect()
    assert out[0].n == 2 and out[0].total == 20.0


def test_select_agg_unknown_op(agg_db):
    from matcha_spark import select_agg, kw

    with pytest.raises(ValueError):
        select_agg(["?c"], {"x": ("median", "?s")},
                   [("?i", kw("cat"), "?c")], agg_db)


# ---------------------------------------------------------------------------
# Bind (SPARQL BIND — computed vars, Spark extension)
# ---------------------------------------------------------------------------


def test_bind_basic_and_chained(spark):
    from pyspark.sql import functions as F

    from matcha_spark import Bind, kw, select
    from matcha_spark.functions.termcols import int_col

    db = TriplesDB.from_triples(
        spark, [(kw("a"), kw("n"), 3), (kw("b"), kw("n"), 7)]
    )
    rows = select(
        ["?s", "?double"],
        [("?s", kw("n"), "?v"),
         Bind("?double", lambda v: int_col((v["?v"]["num"] * 2).cast("long")))],
        db,
    )
    assert rows == [(kw("a"), 6), (kw("b"), 14)]
    # later binds see earlier ones
    rows2 = select(
        ["?s", "?quad"],
        [("?s", kw("n"), "?v"),
         Bind("?double", lambda v: int_col((v["?v"]["num"] * 2).cast("long"))),
         Bind("?quad", lambda v: int_col((v["?double"]["num"] * 2).cast("long")))],
        db,
    )
    assert rows2 == [(kw("a"), 12), (kw("b"), 28)]
    db.unpersist()


def test_bind_join_and_negation_visibility(spark):
    """A bound var is a first-class term: negation blocks anti-join on
    it, and it projects like any var."""
    from matcha_spark import Bind, NotExists, kw, select
    from matcha_spark.functions.termcols import str_col, lex

    db = TriplesDB.from_triples(
        spark,
        [(kw("x"), kw("tag"), "keep"), (kw("y"), kw("tag"), "drop"),
         (kw("z"), kw("banned"), "drop")],
    )
    rows = select(
        ["?s"],
        [("?s", kw("tag"), "?t"),
         Bind("?flag", lambda v: str_col(lex(v["?t"]))),
         NotExists([("?z2", kw("banned"), "?flag")])],
        db,
    )
    assert rows == [kw("x")]  # y's bound flag 'drop' matches the banned value
    db.unpersist()


def test_bind_errors(spark):
    from matcha_spark import Bind, InvalidBgpError, kw, select
    from matcha_spark.functions.termcols import str_col, lex
    import pytest as _pytest

    db = TriplesDB.from_triples(spark, [(kw("a"), kw("n"), 1)])
    with _pytest.raises(InvalidBgpError):
        Bind("notavar", lambda v: None)
    with _pytest.raises(InvalidBgpError):
        Bind("?x", "not-callable")
    with _pytest.raises(ValueError):
        # rebinding an existing var
        select(["?v"], [("?s", kw("n"), "?v"),
                        Bind("?v", lambda v: str_col(lex(v["?v"])))], db)
    db.unpersist()


def test_select_agg_having(agg_db):
    from matcha_spark import kw, select_agg
    from pyspark.sql import functions as _F

    out = select_agg(
        ["?cat"], {"n": ("count", "?i"), "total": ("sum", "?sz")},
        [("?i", kw("cat"), "?cat"), ("?i", kw("size"), "?sz")],
        agg_db,
        having=lambda c: c["total"] > 9.0,
    ).collect()
    assert len(out) == 1 and out[0]["total"] == 12.0  # only c1 survives
    # curried form carries the having through
    q = select_agg(["?cat"], {"n": ("count", None)},
                   [("?i", kw("cat"), "?cat")], having=lambda c: c["n"] >= 4)
    rows = q(agg_db).collect()
    assert {r["n"] for r in rows} == {4}


def test_select_agg_order_limit_offset(agg_db):
    from matcha_spark import kw, select_agg
    from matcha_spark.functions.termcols import lex
    from pyspark.sql import functions as _F

    base = dict(
        group_vars=["?cat"],
        aggs={"total": ("sum", "?sz")},
        patterns=[("?i", kw("cat"), "?cat"), ("?i", kw("size"), "?sz")],
    )
    # ORDER BY total DESC LIMIT 1 → the c1 group (sum 2+4+6=12)
    top = select_agg(**base, db=agg_db, order_by=["-total"], limit=1).select(
        lex(_F.col("`?cat`")).alias("cat"), "total"
    ).collect()
    assert [(r["cat"], r["total"]) for r in top] == [("c1", 12.0)]
    # OFFSET skips past the first ordered solution
    second = select_agg(
        **base, db=agg_db, order_by=["-total"], limit=1, offset=1
    ).select(lex(_F.col("`?cat`")).alias("cat"), "total").collect()
    assert [(r["cat"], r["total"]) for r in second] == [("c0", 9.0)]
    # ascending order by the group var's TERM struct == canonical order
    asc = select_agg(**base, db=agg_db, order_by=["?cat"]).select(
        lex(_F.col("`?cat`")).alias("cat")
    ).collect()
    assert [r["cat"] for r in asc] == ["c0", "c1"]
    # offset without order_by is rejected (nondeterministic page)
    with pytest.raises(ValueError):
        select_agg(**base, db=agg_db, offset=1)
    # curried form carries the modifiers through
    q = select_agg(
        ["?cat"], {"n": ("count", None)}, [("?i", kw("cat"), "?cat")],
        order_by=["-n"], limit=1,
    )
    rows = q(agg_db).collect()
    assert len(rows) == 1 and rows[0]["n"] == 4


def test_paths_bind_agg_compose(spark):
    """Integration: property path + BIND + select_agg in one query —
    the new clause types compose through the same compiler."""
    from matcha_spark import Bind, kw, select_agg
    from matcha_spark.patterns import OneOrMore
    from matcha_spark.functions.termcols import lex, str_col

    # chain: a -> b -> c -> d, plus category tags
    trips = [
        (kw("a"), kw("next"), kw("b")),
        (kw("b"), kw("next"), kw("c")),
        (kw("c"), kw("next"), kw("d")),
        (kw("a"), kw("cat"), "start"),
        (kw("b"), kw("cat"), "mid"),
        (kw("c"), kw("cat"), "mid"),
    ]
    db = TriplesDB.from_triples(spark, trips)
    out = select_agg(
        ["?cat"],
        {"n_reachable": ("count", "?y"), "targets": ("group_concat_distinct", "?y")},
        [
            ("?x", OneOrMore(kw("next")), "?y"),
            ("?x", kw("cat"), "?c"),
            Bind("?cat", lambda v: str_col(lex(v["?c"]))),
        ],
        db,
        concat_sep=",",
    ).collect()
    rows = {r["?cat"]["lex"]: r for r in out}
    # a reaches b,c,d (3); b reaches c,d; c reaches d -> mid = 2+1
    assert rows["start"].n_reachable == 3
    assert rows["start"].targets == "b,c,d"
    assert rows["mid"].n_reachable == 3 and rows["mid"].targets == "c,d"
    db.unpersist()


def test_select_agg_custom_expr_aggregate(agg_db):
    """('expr', fn) escape hatch: arbitrary Spark aggregate Columns
    over the solution multiset — the UDAF surface."""
    from matcha_spark import kw, select_agg
    from matcha_spark.functions import termfns as _T
    from matcha_spark.functions.termcols import lex
    from pyspark.sql import functions as _F

    out = select_agg(
        ["?cat"],
        {
            "n": ("count", None),
            "lex_chars": (
                "expr",
                lambda v: _F.sum(_F.length(v("?i")["lex"])),
            ),
            # term-aware numeric access: t_num NULLs non-numeric kinds
            # (raw v("?sz")["num"] would count their 0.0 mirrors)
            "p50_size": (
                "expr",
                lambda v: _F.percentile_approx(_T.t_num(v("?sz")), 0.5),
            ),
        },
        [("?i", kw("cat"), "?cat"), ("?i", kw("size"), "?sz")],
        agg_db,
    )
    rows = {r["cat"]: r for r in out.select(
        lex(_F.col("`?cat`")).alias("cat"), "n", "lex_chars", "p50_size"
    ).collect()}
    # c0 items: item0/2/4 (kw lex 'item0' etc, 5 chars each)
    assert rows["c0"]["n"] == 3 and rows["c0"]["lex_chars"] == 15
    assert rows["c0"]["p50_size"] == 3.0  # sizes 1,3,5
    assert rows["c1"]["p50_size"] == 4.0  # sizes 2,4,6
    # bad op shape raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        select_agg(["?cat"], {"x": ("expr", 42)}, [("?i", kw("cat"), "?cat")], agg_db)


def test_explain_query_modes(friends_db):
    from matcha_spark import explain_query

    pats = [(rick, FOAF_KNOWS, "?p"), ("?p", RDFS_LABEL, "?name")]
    plan = explain_query(pats, friends_db)
    assert "Physical Plan" in plan and "Join" in plan
    simple = explain_query(pats, friends_db, mode="simple")
    assert "InMemoryTableScan" in simple or "Scan" in simple
    with pytest.raises(Exception):
        explain_query(pats, friends_db, mode="not-a-mode")


def test_subselect_plain_and_agg(friends_db):
    """r09 SPARQL 1.1 subqueries: modifiers apply INSIDE (top-k then
    join), aggregate subqueries expose typed agg vars the outer query
    can FILTER on, projection scoping hides inner non-projected vars,
    and a disjoint subquery is a solution-mapping cartesian."""
    from pyspark.sql import functions as F

    from matcha_spark import select
    from matcha_spark.functions.termcols import lex
    from matcha_spark.patterns import Filter, SubSelect

    # plain: the alphabetically-first 2 labelled people, then join out
    # to their names — LIMIT is inside, so exactly 2 rows survive
    rows = select(
        ["?name"],
        [
            SubSelect(
                ["?p"],
                [("?p", RDFS_LABEL, "?name")],
                order_by=["?p"],
                limit=2,
            ),
            ("?p", RDFS_LABEL, "?name"),
        ],
        friends_db,
    )
    assert rows is not None and len(rows) == 2

    # aggregate: knows-count per person, FILTERed in the outer query
    rows = select(
        ["?name", "?cnt"],
        [
            SubSelect(
                ["?p"],
                [("?p", FOAF_KNOWS, "?q")],
                aggs={"?cnt": ("count", "?q")},
            ),
            ("?p", RDFS_LABEL, "?name"),
            Filter(lambda v: v["?cnt"]["num"] >= 2),
        ],
        friends_db,
    )
    got = {(n, c) for n, c in rows}
    assert got == {("Rick", 2)}  # rick knows martin + katie

    # projection scoping: the subquery's ?name is NOT projected, so the
    # outer ?name binds independently (no accidental correlation)
    rows = select(
        ["?p"],
        [
            SubSelect(["?p"], [("?p", RDFS_LABEL, "?name")]),
            ("?p", FOAF_KNOWS, "?q"),
        ],
        friends_db,
    )
    assert rows is not None and len(rows) >= 1

    # disjoint vars: cartesian of solution mappings
    rows = select(
        ["?name", "?total"],
        [
            ("?p", RDFS_LABEL, "?name"),
            SubSelect(
                [],
                [("?a", FOAF_KNOWS, "?b")],
                aggs={"?total": ("count", "?b")},
            ),
        ],
        friends_db,
    )
    names = {n for n, _t in rows}
    totals = {t for _n, t in rows}
    assert len(names) >= 3 and len(totals) == 1


def test_values_rows_over_subquery_bound_var(friends_db):
    """ADVICE r10: VALUES applies AFTER subquery joins, so a var bound
    only by a SubSelect counts as bound — UNDEF rows are legal for it
    and fully-defined rows CONSTRAIN instead of cross-joining."""
    from matcha_spark.patterns import SubSelect, ValuesRows

    sq = SubSelect(["?p"], [("?p", FOAF_KNOWS, "?q")])
    base = select(["?p"], [sq], friends_db)
    assert base is not None

    # all-UNDEF row: unconstrained — identical to the bare subquery
    rows = select(["?p"], [sq, ValuesRows(["?p"], [(None,)])], friends_db)
    assert sorted(map(str, rows)) == sorted(map(str, base))

    # defined row: a constraint join on the subquery-projected var
    rows = select(["?p"], [sq, ValuesRows(["?p"], [(rick,)])], friends_db)
    assert rows == [rick]

    # mixed tuple: ?q genuinely new (defined in every row), ?p
    # subquery-bound with an UNDEF — the UNDEF must not be rejected
    rows = select(
        ["?p", "?x"],
        [sq, ValuesRows(["?p", "?x"], [(None, 1), (rick, 2)])],
        friends_db,
    )
    got = {(str(p), x) for p, x in rows}
    assert (str(rick), 1) in got and (str(rick), 2) in got
    assert (str(katie), 1) in got and (str(katie), 2) not in got


def test_exists_positive_filter(friends_db):
    """r09 FILTER EXISTS: the semi-join twin of NotExists — keeps
    solutions whose block matches; uncorrelated blocks keep everything
    or nothing."""
    from matcha_spark import Exists, select

    # people with at least one knows-edge, by name
    rows = select(
        ["?name"],
        [("?p", RDFS_LABEL, "?name"), Exists([("?p", FOAF_KNOWS, "?q")])],
        friends_db,
    )
    assert set(rows) == {"Rick", "Katie"}
    # uncorrelated, matching: keeps all labelled people
    all_rows = select(
        ["?name"],
        [("?p", RDFS_LABEL, "?name"), Exists([("?a", FOAF_KNOWS, "?b")])],
        friends_db,
    )
    base = select(["?name"], [("?p", RDFS_LABEL, "?name")], friends_db)
    assert set(all_rows) == set(base)
    # uncorrelated, non-matching: empties
    assert (
        select(
            ["?name"],
            [("?p", RDFS_LABEL, "?name"), Exists([("?a", kw_not_matching(), "?b")])],
            friends_db,
        )
        is None
    )


def test_values_rows_inline_data(friends_db):
    """r09 multi-var VALUES: tuple rows constrain jointly; UNDEF (None)
    leaves a pattern-bound var unconstrained for that row; new vars
    defined in every row bind as columns; empty data yields nothing."""
    from matcha_spark import ValuesRows, select
    from matcha_spark.errors import InvalidValuesError

    pats = [("?p", FOAF_KNOWS, "?q"), ("?q", RDFS_LABEL, "?name")]
    # joint constraint: only the (rick -> Martin) combination survives
    rows = select(
        ["?name"],
        pats + [ValuesRows(("?p", "?name"), [(rick, "Martin"), (julie, "Katie")])],
        friends_db,
    )
    assert rows == ["Martin"]
    # UNDEF on ?name: the rick row admits all of rick's friends
    rows = select(
        ["?name"],
        pats + [ValuesRows(("?p", "?name"), [(rick, None), (julie, "Katie")])],
        friends_db,
    )
    assert set(rows) == {"Martin", "Katie"}
    # new var defined in every row binds as a column (cartesian tags)
    rows = select(
        ["?name", "?tag"],
        [(rick, RDFS_LABEL, "?name"), ValuesRows(("?tag",), [(1,), (2,)])],
        friends_db,
    )
    assert as_set(rows) == {("Rick", 1), ("Rick", 2)}
    # UNDEF cannot bind a var no pattern binds
    with pytest.raises(ValueError):
        select(
            ["?name", "?tag"],
            [(rick, RDFS_LABEL, "?name"), ValuesRows(("?tag",), [(1,), (None,)])],
            friends_db,
        )
    # empty inline data: no solutions
    assert (
        select(["?name"], pats + [ValuesRows(("?name",), [])], friends_db)
        is None
    )
    # ragged row raises at construction
    with pytest.raises(InvalidValuesError):
        ValuesRows(("?a", "?b"), [(1,)])


def test_describe_one_hop_graph(friends_db):
    """r09 DESCRIBE-lite: the symmetric one-hop sub-graph about a node
    — outgoing triples plus (default) incoming ones; incoming=False
    keeps the classic subject-only shape; the output is a graph frame
    (TERM s/p/o) that round-trips through select."""
    from matcha_spark import describe, select
    from matcha_spark.terms import from_term

    g = describe(katie, friends_db)
    got = {
        (from_term(r.s), from_term(r.p), from_term(r.o)) for r in g.collect()
    }
    want = {t for t in friends if t[0] == katie or t[2] == katie}
    assert got == want and len(got) >= 2  # label + knows edges
    out_only = describe(katie, friends_db, incoming=False)
    got_out = {
        (from_term(r.s), from_term(r.p), from_term(r.o))
        for r in out_only.collect()
    }
    assert got_out == {t for t in friends if t[0] == katie}
    # composable as a db: query the described sub-graph directly
    assert select(["?n"], [(katie, RDFS_LABEL, "?n")], g) == ["Katie"]
