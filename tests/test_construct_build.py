"""Port of the reference's construct/build/merge-dbs tests
(test:114-264, 611-790)."""

import pytest

from matcha_spark import (
    GRAFTER_URI,
    LangString,
    Optional,
    RDFLiteral,
    TriplesDB,
    Values,
    build,
    build_1,
    construct,
    construct_1,
    merge_dbs,
    select,
)

from .fixtures import (
    FOAF_KNOWS,
    RDFS_LABEL,
    abc_db,
    build_1_db,
    build_db,
    friends,
    issue_21_db,
    julie,
    katie,
    martin,
    rick,
)
from .util import blind


def kw(s):
    from matcha_spark import kw as _kw

    return _kw(s)


@pytest.fixture(scope="module")
def friends_db(spark):
    return TriplesDB.from_triples(spark, friends)


# -- construct (test:114-209) -----------------------------------------------


def test_construct_rick(friends_db):
    res = construct({GRAFTER_URI: rick, "?p": "?o"}, [(rick, "?p", "?o")], friends_db)
    assert res == [
        {GRAFTER_URI: rick, RDFS_LABEL: "Rick", FOAF_KNOWS: {martin, katie}}
    ]


def test_construct_none_when_no_matches(spark):
    assert (
        construct(["?p", "?o"], [(kw("not-matching"), "?p", "?o")], abc_db) is None
    )
    assert (
        construct(
            {GRAFTER_URI: "?s", "?p": "?o"},
            [("?s", kw("not"), kw("matching")), ("?s", "?p", "?o")],
            abc_db,
        )
        is None
    )


def test_construct_1_nil_subject(spark):
    res = construct_1("?label", [(None, kw("label"), "?label")], [(None, kw("label"), "nil label")])
    assert res == "nil label"


def test_construct_nested_template(friends_db):
    res = construct(
        {GRAFTER_URI: rick, FOAF_KNOWS: {"s": "?p", "l": "?name"}},
        [(rick, FOAF_KNOWS, "?p"), ("?p", RDFS_LABEL, "?name")],
        friends_db,
    )
    assert len(res) == 1
    m = res[0]
    assert m[GRAFTER_URI] == rick
    got = m[FOAF_KNOWS]
    expected = [{"s": martin, "l": "Martin"}, {"s": katie, "l": "Katie"}]
    assert {blind(x) for x in got} == {blind(x) for x in expected}


def test_construct_vector_solution(friends_db):
    res = construct(["?s", "?p", "?o"], [("?s", "?p", "?o")], friends_db)
    assert {tuple(r) for r in res} == {tuple(t) for t in friends}


def test_construct_single_projected(friends_db):
    res = construct(["?s"], [("?s", "?p", "?o")], friends_db)
    assert {tuple(r) for r in res} == {(t[0],) for t in friends}


def test_construct_arbitrary_structure(friends_db):
    res = construct(
        ["foo", frozenset([(1, 2, "?p", "?o")])],
        [(rick, "?p", "?o")],
        friends_db,
    )
    got = {blind(tuple(r)) for r in res}
    expected = {
        blind(("foo", frozenset([(1, 2, FOAF_KNOWS, katie)]))),
        blind(("foo", frozenset([(1, 2, FOAF_KNOWS, martin)]))),
        blind(("foo", frozenset([(1, 2, RDFS_LABEL, "Rick")]))),
    }
    assert got == expected


def test_construct_plain_map_no_grouping(friends_db):
    res = construct({"subj": "?s", "?p": "?o"}, [("?s", "?p", "?o")], friends_db)
    assert len(res) == 7  # one map per solution, no subject grouping


def test_construct_grafter_uri_grouping(friends_db):
    res = construct({GRAFTER_URI: "?s", "?p": "?o"}, [("?s", "?p", "?o")], friends_db)
    by_subj = {m[GRAFTER_URI]: m for m in res}
    assert by_subj[martin] == {GRAFTER_URI: martin, RDFS_LABEL: "Martin"}
    assert by_subj[rick] == {
        GRAFTER_URI: rick,
        RDFS_LABEL: "Rick",
        FOAF_KNOWS: {martin, katie},
    }
    assert by_subj[julie] == {GRAFTER_URI: julie, RDFS_LABEL: "Julie"}
    assert by_subj[katie] == {
        GRAFTER_URI: katie,
        RDFS_LABEL: "Katie",
        FOAF_KNOWS: julie,
    }


def test_construct_interop_literals(spark):
    ls = LangString("foo", "en")
    res = construct_1("?o", [("?s", "?p", "?o")], [(kw("a"), kw("b"), ls)])
    assert res == ls
    rl = RDFLiteral("foo", "http://some/datatype")
    res = construct_1("?o", [("?s", "?p", "?o")], [(kw("a"), kw("b"), rl)])
    assert res == rl


def test_quad_tolerance(spark):
    quads = [(kw("s"), kw("p"), kw("o"), kw("g")), (kw("s"), kw("p2"), kw("o2"), kw("g"))]
    res = construct("?o", [("?s", "?p", "?o")], quads)
    assert set(res) == {kw("o"), kw("o2")}


# -- build (test:611-716) ---------------------------------------------------


def test_build_unbound_subject(spark):
    ret = build("?s", {"?p": "?o"}, [("?s", "?p", "?o")], build_db)
    assert {blind(m) for m in ret} == {
        blind({GRAFTER_URI: kw("s"), kw("p"): kw("o"), kw("p2"): kw("o2")}),
        blind({GRAFTER_URI: kw("s2"), kw("p"): kw("o3")}),
    }


def test_build_bound_subject(spark):
    subject = kw("s")
    ret = build(subject, {"?p": "?o"}, [(subject, "?p", "?o")], build_db)
    assert {blind(m) for m in ret} == {
        blind({GRAFTER_URI: kw("s"), kw("p"): kw("o"), kw("p2"): kw("o2")})
    }


def test_build_optionals_and_predicate_grouping(spark):
    db = [
        (kw("s"), kw("label"), "s"),
        (kw("s"), kw("label"), "s another"),
        (kw("s"), kw("p2"), kw("o2")),
        (kw("s"), kw("optional"), "optional"),
        (kw("s2"), kw("label"), "s2"),
        (kw("s2"), kw("p2"), kw("o2")),
    ]
    ret = build(
        "?s",
        {kw("label"): "?label", kw("optional"): "?opt"},
        [("?s", kw("label"), "?label"), Optional([("?s", kw("optional"), "?opt")])],
        db,
    )
    assert {blind(m) for m in ret} == {
        blind(
            {
                GRAFTER_URI: kw("s"),
                kw("label"): {"s", "s another"},
                kw("optional"): "optional",
            }
        ),
        blind({GRAFTER_URI: kw("s2"), kw("label"): "s2"}),
    }


def test_build_1_multi_valued(spark):
    ret = build_1(
        "?s",
        {"?p": "?o"},
        [Values("?s", [kw("s")]), ("?s", "?p", "?o")],
        build_1_db,
    )
    assert blind(ret) == blind(
        {GRAFTER_URI: kw("s"), kw("p"): kw("o"), kw("p2"): {kw("o2"), kw("o3")}}
    )


def test_build_custom_subject_key_issue_21(spark):
    result_ab = build(
        (kw("id"), "?id"),
        {kw("id"): "?id", kw("optional-a"): "?oa", kw("optional-b"): "?ob"},
        [
            ("?id", kw("p"), "?o"),
            Optional([("?id", kw("p2"), "?oa")]),
            Optional([("?id", kw("p3"), "?ob")]),
        ],
        issue_21_db,
    )
    result_ba = build(
        (kw("id"), "?id"),
        {kw("id"): "?id", kw("optional-a"): "?oa", kw("optional-b"): "?ob"},
        [
            ("?id", kw("p"), "?o"),
            Optional([("?id", kw("p3"), "?ob")]),
            Optional([("?id", kw("p2"), "?oa")]),
        ],
        issue_21_db,
    )
    assert result_ab == result_ba
    assert result_ab == [
        {kw("id"): 1, kw("optional-a"): kw("X"), kw("optional-b"): kw("Z")}
    ]


def test_build_catalog(spark):
    from .fixtures import catalog_data

    ret = build(
        "?ds",
        {
            kw("dcterms/creator"): "?creator",
            kw("dcterms/publisher"): "?pub",
            kw("dcterms/spatial"): "?area",
            kw("dcat/spatialResolutionInMeters"): "?resolution",
        },
        [
            ("?ds", kw("a"), kw("dcat/Dataset")),
            ("?ds", kw("dcterms/title"), "?title"),
            Optional(
                [
                    ("?ds", kw("dcterms/spatial"), "?area"),
                    ("?ds", kw("dcat/spatialResolutionInMeters"), "?resolution"),
                ]
            ),
            Optional([("?ds", kw("dcterms/publisher"), "?pub")]),
            Optional([("?ds", kw("dcterms/creator"), "?creator")]),
        ],
        catalog_data,
    )
    assert {blind(m) for m in ret} == {
        blind({GRAFTER_URI: kw("operations"), kw("dcterms/creator"): kw("nhs")}),
        blind(
            {
                GRAFTER_URI: kw("crime"),
                kw("dcterms/spatial"): kw("manchester"),
                kw("dcat/spatialResolutionInMeters"): 50,
                kw("dcterms/publisher"): kw("ons"),
                kw("dcterms/creator"): kw("moj"),
            }
        ),
        blind({GRAFTER_URI: kw("deprivation"), kw("dcterms/publisher"): kw("dluhc")}),
    }


# -- merge-dbs (test:211-231) ----------------------------------------------


def test_merge_dbs_idempotent(spark):
    db1 = TriplesDB.from_triples(spark, [(1, 2, 3)])
    merged = merge_dbs(db1, [(1, 2, 3)])
    assert merged.df.count() == 1


def test_merge_dbs_multiple(spark):
    merged = merge_dbs([(1, 2, 3)], [(4, 5, 6)])
    assert merged.df.count() == 2
    res = select(["?s"], [("?s", 2, 3)], merged)
    assert res == [1]


def test_merge_dbs_complex(spark):
    merged = merge_dbs(
        [(kw("s"), kw("p"), kw("o"))],
        [(kw("s"), kw("p2"), kw("o"))],
        [(kw("s"), kw("p2"), kw("o2"))],
    )
    assert merged.df.count() == 3


# -- build_df: the distributed build path ------------------------------------


def test_build_df_distributed(spark):
    from matcha_spark import build_df
    from matcha_spark.terms import from_term

    db = [
        (kw("s"), kw("label"), "s"),
        (kw("s"), kw("label"), "s another"),
        (kw("s"), kw("optional"), "optional"),
        (kw("s2"), kw("label"), "s2"),
    ]
    out = build_df(
        "?s",
        {"label": "?label", "opt": "?opt"},
        [("?s", kw("label"), "?label"), Optional([("?s", kw("optional"), "?opt")])],
        db,
    )
    rows = {
        from_term(r["subject"]): {
            "label": sorted(from_term(t) for t in r["label"]),
            "opt": [from_term(t) for t in r["opt"]],
        }
        for r in out.collect()
    }
    assert rows[kw("s")]["label"] == ["s", "s another"]
    assert rows[kw("s")]["opt"] == ["optional"]
    assert rows[kw("s2")]["label"] == ["s2"]
    assert rows[kw("s2")]["opt"] == []


def test_merge_dbs_with_loaded_db(spark, tmp_path):
    # a loaded DB carries the p_bucket partition column; merge must
    # normalize to (s, p, o) instead of failing unionByName
    db1 = TriplesDB.from_triples(spark, [(kw("a"), kw("p"), 1)])
    path = str(tmp_path / "merge_loaded")
    db1.save(path)
    loaded = TriplesDB.load(spark, path)
    merged = merge_dbs(loaded, [(kw("b"), kw("p"), 2)])
    assert merged.df.columns == ["s", "p", "o"]
    assert merged.df.count() == 2
    assert select(["?o"], [("?s", kw("p"), "?o")], merged) == [1, 2]


def test_construct_db_materializes_graph(spark):
    """Distributed CONSTRUCT: solutions → new queryable TriplesDB."""
    from matcha_spark import construct_db

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("knows"), kw("b")),
            (kw("b"), kw("knows"), kw("c")),
            (kw("a"), kw("name"), "Alice"),
            (kw("b"), kw("name"), "Bob"),
        ],
    )
    g2 = construct_db(
        [("?y", kw("known_by"), "?x"), ("?y", kw("source"), "graph1")],
        [("?x", kw("knows"), "?y")],
        db,
    )
    assert select(["?who"], [(kw("b"), kw("known_by"), "?who")], g2) == [kw("a")]
    assert set(select(["?s"], [("?s", kw("source"), "graph1")], g2)) == {kw("b"), kw("c")}
    # 2 solutions x 2 templates, set-deduped
    assert g2.df.count() == 4
    db.unpersist()


def test_construct_db_drops_unbound_template_rows(spark):
    from matcha_spark import Optional, construct_db

    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), kw("status"), "ok"),
            (kw("b"), kw("status"), "ok"),
            (kw("a"), kw("email"), "a@x.com"),
        ],
    )
    g2 = construct_db(
        [("?s", kw("contact"), "?e")],
        [("?s", kw("status"), "ok"), Optional([("?s", kw("email"), "?e")])],
        db,
    )
    # only :a has an email; :b's unbound ?e drops its template row
    assert select(["?s", "?e"], [("?s", kw("contact"), "?e")], g2) == [(kw("a"), "a@x.com")]
    db.unpersist()
