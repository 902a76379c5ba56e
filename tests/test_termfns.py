"""SPARQL-1.1-style scalar term functions (functions/termfns.py):
unit behavior per kind + composition through Bind/Filter/having."""

import pytest
from pyspark.sql import functions as F

from matcha_spark import Bind, Filter, TriplesDB, kw, select, select_agg, select_df
from matcha_spark.functions import termfns as T
from matcha_spark.functions.termcols import lex, lex_as
from matcha_spark.terms import URI, to_term


@pytest.fixture(scope="module")
def fn_db(spark):
    import datetime as dt

    trips = [
        (URI("urn:a"), kw(":name"), "Ada Lovelace"),
        (URI("urn:a"), kw(":age"), 36),
        (URI("urn:a"), kw(":score"), 2.5),
        (URI("urn:a"), kw(":born"), dt.date(1815, 12, 10)),
        (URI("urn:b"), kw(":name"), "Noether"),
        (URI("urn:b"), kw(":age"), 53),
    ]
    return TriplesDB.from_triples(spark, trips)


def _one(db, expr_builder, patterns, var="?v"):
    rows = select_df([var], patterns, db).collect()
    return rows


def test_string_functions_compose_in_bind(fn_db):
    res = select_df(
        ["?name", "?len", "?up3"],
        [
            ("?s", kw(":name"), "?name"),
            Bind("?len", lambda v: T.t_strlen(v["?name"])),
            Bind("?up3", lambda v: T.t_ucase(T.t_substr(v["?name"], 1, 3))),
        ],
        fn_db,
    )
    got = {
        r[0]: (r[1], r[2])
        for r in res.select(
            lex(F.col("`?name`")),
            lex_as(F.col("`?len`"), "bigint"),
            lex(F.col("`?up3`")),
        ).collect()
    }
    assert got == {"Ada Lovelace": (12, "ADA"), "Noether": (7, "NOE")}


def test_predicates_in_filter(fn_db):
    got = select(
        ["?name"],
        [
            ("?s", kw(":name"), "?name"),
            Filter(lambda v: T.t_strstarts(v["?name"], "Ada")),
        ],
        fn_db,
    )
    assert got == ["Ada Lovelace"]
    got2 = select(
        ["?s"],
        [
            ("?s", kw(":age"), "?a"),
            Filter(lambda v: T.t_num(v["?a"]) > 40),
        ],
        fn_db,
    )
    assert [str(g) for g in got2] == ["urn:b"]


def test_arithmetic_and_rounding(fn_db):
    res = select_df(
        ["?sum", "?half"],
        [
            ("?s", kw(":age"), "?a"),
            ("?s", kw(":score"), "?sc"),
            Bind("?sum", lambda v: T.t_add(v["?a"], v["?sc"])),
            Bind("?half", lambda v: T.t_round(T.t_div(v["?a"], v["?sc"]), 1)),
        ],
        fn_db,
    )
    rows = res.select(
        F.col("`?sum`")["num"], F.col("`?half`")["num"]
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [(38.5, 14.4)]
    # division by zero -> NULL num, not an error
    res0 = select_df(
        ["?z"],
        [
            ("?s", kw(":age"), "?a"),
            Bind("?z", lambda v: T.t_div(v["?a"], T.t_sub(v["?a"], v["?a"]))),
        ],
        fn_db,
    )
    assert all(r[0]["num"] is None for r in res0.collect())


def test_date_extraction(fn_db):
    res = select_df(
        ["?y", "?m", "?d"],
        [
            ("?s", kw(":born"), "?b"),
            Bind("?y", lambda v: T.t_year(v["?b"])),
            Bind("?m", lambda v: T.t_month(v["?b"])),
            Bind("?d", lambda v: T.t_day(v["?b"])),
        ],
        fn_db,
    )
    r = res.select(
        lex_as(F.col("`?y`"), "int"),
        lex_as(F.col("`?m`"), "int"),
        lex_as(F.col("`?d`"), "int"),
    ).collect()
    assert [(x[0], x[1], x[2]) for x in r] == [(1815, 12, 10)]


def test_type_predicates_and_str_of_double(fn_db):
    res = select_df(
        ["?rendered"],
        [
            ("?s", kw(":score"), "?sc"),
            Bind("?rendered", lambda v: T.t_str(v["?sc"])),
        ],
        fn_db,
    )
    # doubles render from the num mirror (lex is empty by design)
    assert [lexv[0] for lexv in res.select(lex(F.col("`?rendered`"))).collect()] == ["2.5"]


def test_coalesce_skips_unbound(fn_db):
    """Bind sees only required vars (clause order: binds before
    optionals), so COALESCE over an OPTIONAL var composes on the
    distributed select_df OUTPUT, where unbound markers live."""
    from matcha_spark import Optional

    res = select_df(
        ["?name", "?sc"],
        [
            ("?s", kw(":name"), "?name"),
            Optional([("?s", kw(":score"), "?sc")]),
        ],
        fn_db,
    )
    out = res.select(
        T.t_str(T.t_coalesce(F.col("`?sc`"), F.col("`?name`")))["lex"].alias("v")
    )
    # a has a score (2.5); b falls back to its name
    assert {r["v"] for r in out.collect()} == {"2.5", "Noether"}


def test_having_with_term_functions(fn_db):
    out = select_agg(
        [],
        {"total": ("sum", "?a")},
        [("?s", kw(":age"), "?a")],
        fn_db,
        having=lambda c: c["total"] > 50,
    ).collect()
    assert len(out) == 1 and out[0]["total"] == 89.0


def test_arith_error_decodes_to_none(spark):
    """r14 (found by the Bind fuzzer): a numeric Bind over a
    non-numeric var yields a NULL-num double term — the termfns
    error-as-absence convention — and the list-API decode must render
    it as None (absence), not crash float(None)."""
    from matcha_spark import Bind, TriplesDB, select
    from matcha_spark.terms import from_term

    assert from_term(("double", "", None, "", "")) is None
    db = TriplesDB.from_triples(spark, [("a", "p", "s1"), ("b", "p", 5)])
    try:
        got = select(
            ["?s", "?sum"],
            [("?s", "p", "?x"),
             Bind("?sum", lambda v: T.t_add(v["?x"], v["?x"]))],
            db,
        )
    finally:
        db.unpersist()
    assert set(got) == {("a", None), ("b", 10.0)}
