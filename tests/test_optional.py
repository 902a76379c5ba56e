"""Port of the reference's optional-semantics battery
(test:467-577, 689-716, 741-807) — the hard 30%."""

import pytest

from matcha_spark import Optional, TriplesDB, Unbound, Values, select

from .fixtures import (
    FOAF_KNOWS,
    RDFS_LABEL,
    catalog_data,
    john_status,
    john_status_b,
    julie,
    katie,
    martin,
    optional_friends,
    other_label,
    rick,
    tiny_db,
)
from .util import UNBOUND, as_set


@pytest.fixture(scope="module")
def of_db(spark):
    return TriplesDB.from_triples(spark, optional_friends)


@pytest.fixture(scope="module")
def catalog_db(spark):
    return TriplesDB.from_triples(spark, catalog_data)


def kw(s):
    from matcha_spark import kw as _kw

    return _kw(s)


# -- optional-only queries (test:469-500) -----------------------------------


def test_optional_only_matching(spark):
    res = select(["?s", "?p", "?o"], [Optional([("?s", "?p", "?o")])], tiny_db)
    assert as_set(res) == {(kw("a"), kw("triple"), kw("here"))}


def test_optional_only_not_matching_is_none(spark):
    res = select(
        ["?s", "?p", "?o"],
        [Optional([(kw("do"), kw("not"), kw("match"))])],
        tiny_db,
    )
    assert res is None


def test_required_with_nonmatching_optional(spark):
    res = select(
        ["?s", "?p", "?o"],
        [
            ("?s", "?p", "?o"),
            Optional(
                [
                    (kw("optional"), kw("doesnt"), kw("match")),
                    (kw("but"), kw("required-pattern"), kw("does")),
                ]
            ),
        ],
        tiny_db,
    )
    assert as_set(res) == {(kw("a"), kw("triple"), kw("here"))}


def test_required_with_same_optional(spark):
    res = select(
        ["?s", "?p", "?o"],
        [("?s", "?p", "?o"), Optional([("?s", "?p", "?o")])],
        tiny_db,
    )
    assert as_set(res) == {(kw("a"), kw("triple"), kw("here"))}


def test_two_optionals_one_matching(spark):
    res = select(
        ["?s", "?p", "?o"],
        [
            Optional(
                [
                    (kw("optional"), kw("doesnt"), kw("match")),
                    (kw("but"), kw("other-optional"), kw("does")),
                ]
            ),
            Optional([("?s", "?p", "?o")]),
        ],
        tiny_db,
    )
    assert as_set(res) == {(kw("a"), kw("triple"), kw("here"))}


# -- shared-var optionals (test:502-518) ------------------------------------


def test_optional_other_label(of_db):
    res = select(
        ["?o", "?name"],
        [(katie, FOAF_KNOWS, "?o"), Optional([("?o", other_label, "?name")])],
        of_db,
    )
    assert as_set(res) == {(julie, "Not a robot")}


def test_shared_var_two_optional_blocks(of_db):
    res = select(
        ["?o", "?name"],
        [
            (rick, FOAF_KNOWS, "?o"),
            Optional([("?o", RDFS_LABEL, "?name")]),
            Optional([("?o", other_label, "?name")]),
        ],
        of_db,
    )
    assert as_set(res) == {(martin, "Martin"), (katie, "Katie")}


# -- cartesian reconstruction (test:520-541) --------------------------------


def test_optional_cartesian(spark):
    res = select(
        ["?o", "?p", "?x"],
        [
            ("?o", kw("status"), "?status"),
            Optional([("?o", kw("prop1"), "?p")]),
            Optional([("?o", kw("prop2"), "?x")]),
        ],
        john_status,
    )
    assert as_set(res) == {
        (kw("john"), "A", kw("x")),
        (kw("john"), "A", kw("y")),
        (kw("john"), "B", kw("x")),
        (kw("john"), "B", kw("y")),
    }


def test_optional_unbound_marker_shared_in_group(spark):
    res = select(
        ["?o", "?p", "?x"],
        [
            ("?o", kw("status"), "?status"),
            Optional([("?o", kw("prop1"), "?p")]),
            Optional([("?o", kw("prop2"), "?x")]),
        ],
        john_status_b,
    )
    assert as_set(res) == {
        (kw("john"), UNBOUND, kw("x")),
        (kw("john"), UNBOUND, kw("y")),
    }
    # the reference emits ONE marker per (group, var): both rows share it
    markers = {v for row in res for v in row if isinstance(v, Unbound)}
    assert len(markers) == 1


# -- optionals × values (test:543-563) --------------------------------------


def test_optional_with_values(of_db):
    res = select(
        ["?o", "?name"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            Optional([("?o", RDFS_LABEL, "?name")]),
            Optional([("?o", other_label, "?name")]),
            Values("?person", {rick, katie}),
        ],
        of_db,
    )
    assert as_set(res) == {(martin, "Martin"), (katie, "Katie"), (julie, "Not a robot")}


def test_optional_thing_not_there(of_db):
    res = select(
        ["?o", "?name"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            ("?o", RDFS_LABEL, "?name"),
            Optional([("?o", kw("who/am-i?"), "?dunno")]),
            Values("?person", {rick, katie}),
        ],
        of_db,
    )
    assert as_set(res) == {(martin, "Martin"), (katie, "Katie")}


# -- nested optionals (test:566-577) ----------------------------------------


def test_nested_optionals(of_db):
    res = select(
        ["?o", "?eman"],
        [
            ("?person", FOAF_KNOWS, "?o"),
            Optional(
                [
                    ("?o", RDFS_LABEL, "?name"),
                    Optional(
                        [
                            ("?name", kw("name/backwards"), "?eman"),
                            Values("?name", {"Martin"}),
                        ]
                    ),
                ]
            ),
            Values("?person", {rick, katie}),
        ],
        of_db,
    )
    assert as_set(res) == {(martin, "Nitram"), (katie, UNBOUND), (julie, UNBOUND)}


# -- catalog battery (test:741-761) -----------------------------------------


def test_catalog_multi_optionals(catalog_db):
    res = select(
        ["?ds", "?title", "?pub", "?creator", "?area", "?resolution"],
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
        catalog_db,
    )
    assert as_set(res) == {
        (kw("operations"), "Operational Procedures", UNBOUND, kw("nhs"), UNBOUND, UNBOUND),
        (kw("deprivation"), "Covid", kw("dluhc"), UNBOUND, UNBOUND, UNBOUND),
        (kw("crime"), "Crime", kw("ons"), kw("moj"), kw("manchester"), 50),
    }


# -- values-only required + optionals (test:792-807) ------------------------


def test_optionals_with_values_only_required(catalog_db):
    res = select(
        ["?ds", "?title", "?pub", "?creator", "?area", "?resolution"],
        [
            Values("?ds", [kw("crime"), kw("deprivation")]),
            Optional(
                [
                    ("?ds", kw("dcterms/spatial"), "?area"),
                    ("?ds", kw("dcat/spatialResolutionInMeters"), "?resolution"),
                ]
            ),
            Optional([("?ds", kw("dcterms/publisher"), "?pub")]),
            Optional([("?ds", kw("dcterms/creator"), "?creator")]),
        ],
        catalog_db,
    )
    assert as_set(res) == {
        (kw("crime"), UNBOUND, kw("ons"), kw("moj"), kw("manchester"), 50),
        (kw("deprivation"), UNBOUND, kw("dluhc"), UNBOUND, UNBOUND, UNBOUND),
    }


# -- optional-ordering invariance, select level (test:689-716) ---------------


def test_optional_order_invariance(spark):
    from .fixtures import issue_21_db

    pats_ab = [
        ("?id", kw("p"), "?o"),
        Optional([("?id", kw("p2"), "?oa")]),
        Optional([("?id", kw("p3"), "?ob")]),
    ]
    pats_ba = [
        ("?id", kw("p"), "?o"),
        Optional([("?id", kw("p3"), "?ob")]),
        Optional([("?id", kw("p2"), "?oa")]),
    ]
    ra = select(["?id", "?oa", "?ob"], pats_ab, issue_21_db)
    rb = select(["?id", "?oa", "?ob"], pats_ba, issue_21_db)
    assert as_set(ra) == as_set(rb) == {(1, kw("X"), kw("Z"))}


def test_optional_regroup_no_single_partition_exchange(spark):
    """Marker numbering must not force a global single-partition sort:
    at scale a Window.orderBy with no partitionBy would serialize every
    optional-projecting select through one task."""
    from matcha_spark.query import select_df

    db = TriplesDB.from_triples(
        spark,
        [(kw(f"s{i}"), kw("status"), kw("ok")) for i in range(10)]
        + [(kw(f"s{i}"), kw("prop"), i) for i in range(0, 10, 2)],
    )
    df = select_df(
        ["?s", "?v"],
        [("?s", kw("status"), "?v0"), Optional([("?s", kw("prop"), "?v")])],
        db,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert df.count() == 10
    db.unpersist()


def test_subselect_inside_optional(spark):
    """r09 pattern classes recurse through Optional blocks: an
    aggregate SubSelect inside OPTIONAL contributes its vars to
    matching solutions and leaves them unbound elsewhere."""
    from matcha_spark import Optional, SubSelect, TriplesDB, Unbound, select, kw

    K, L = kw("knows"), kw("label")
    db = TriplesDB.from_triples(
        spark,
        [
            (kw("a"), K, kw("b")),
            (kw("a"), K, kw("c")),
            (kw("b"), K, kw("c")),
            (kw("a"), L, "A"),
            (kw("b"), L, "B"),
            (kw("d"), L, "D"),  # no knows edges
        ],
    )
    rows = select(
        ["?name", "?cnt"],
        [
            ("?p", L, "?name"),
            Optional(
                [SubSelect(["?p"], [("?p", K, "?q")], aggs={"?cnt": ("count", "?q")})]
            ),
        ],
        db,
    )
    got = {(n, c if not isinstance(c, Unbound) else None) for n, c in rows}
    assert got == {("A", 2), ("B", 1), ("D", None)}
    db.unpersist()


def test_values_rows_inside_optional(spark):
    """ValuesRows inside an Optional block constrains only the branch
    it lives in (solutions failing it keep the required part)."""
    from matcha_spark import Optional, TriplesDB, Unbound, ValuesRows, select, kw

    L, T = kw("label"), kw("tag")
    db = TriplesDB.from_triples(
        spark,
        [
            (kw("x"), L, "X"),
            (kw("y"), L, "Y"),
            (kw("x"), T, 1),
            (kw("y"), T, 9),
        ],
    )
    rows = select(
        ["?name", "?t"],
        [
            ("?e", L, "?name"),
            Optional([("?e", T, "?t"), ValuesRows(("?t",), [(1,), (2,)])]),
        ],
        db,
    )
    got = {(n, t if not isinstance(t, Unbound) else None) for n, t in rows}
    assert got == {("X", 1), ("Y", None)}
    db.unpersist()
