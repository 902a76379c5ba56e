"""Term codec round-trips and TriplesDB behaviors (reference parity:
src:32-76, test:234-264)."""

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from matcha_spark import (
    URI,
    Keyword,
    LangString,
    RDFLiteral,
    TriplesDB,
    Unbound,
    kw,
    select,
)
from matcha_spark.terms import from_term, to_term

from .fixtures import FOAF_KNOWS, RDFS_LABEL, friends_big, rick

VALUES = [
    None,
    True,
    False,
    0,
    -17,
    50,
    2**40,
    1.5,
    -0.25,
    "",
    "hello",
    "?not-a-var-actually",  # round-trips fine as a plain value
    kw("a"),
    kw("foaf/knows"),
    URI("http://example.com/x"),
    LangString("foo", "en"),
    RDFLiteral("foo", "http://some/datatype"),
    datetime.date(2024, 1, 1),
    datetime.datetime(2024, 1, 1, 12, 30, 15),
    Unbound(3),
]


@pytest.mark.parametrize("v", VALUES, ids=[repr(v) for v in VALUES])
def test_roundtrip(v):
    assert from_term(to_term(v)) == v


def test_distinct_kinds_not_equal():
    # :rick ≠ "rick" ≠ URI("rick") ≠ 50 ≠ 50.0 (host-equality semantics)
    encs = {to_term(kw("rick")), to_term("rick"), to_term(URI("rick"))}
    assert len(encs) == 3
    assert to_term(50) != to_term(50.0)
    assert to_term(True) != to_term(1)


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=50),
    )
)
def test_roundtrip_property(v):
    assert from_term(to_term(v)) == v


def test_duplicate_triples_deduped(spark):
    db = TriplesDB.from_triples(spark, [(1, 2, 3), (1, 2, 3), (4, 5, 6)])
    assert db.df.count() == 2


def test_bigish_dataset_query(spark):
    # reference scale smoke (test:253-264): 100k-triple chain, 2-pattern join
    db = TriplesDB.from_triples(spark, friends_big())
    res = select(
        ["?name"],
        [(rick, FOAF_KNOWS, "?p"), ("?p", RDFS_LABEL, "?name")],
        db,
    )
    assert set(res) == {"Martin", "Katie"}
    db.unpersist()


def test_save_load_roundtrip(spark, tmp_path):
    db = TriplesDB.from_triples(spark, [(kw("a"), kw("p"), 1), (kw("b"), kw("p"), 2)])
    path = str(tmp_path / "triples")
    db.save(path)
    db2 = TriplesDB.load(spark, path)
    assert db2.df.count() == 2
    assert select(["?o"], [(kw("a"), kw("p"), "?o")], db2) == [1]


def test_partition_pruning_on_loaded_db(spark, tmp_path):
    from matcha_spark.query import select_df

    db = TriplesDB.from_triples(
        spark,
        [(kw(f"s{i}"), kw("p1" if i % 2 else "p2"), i) for i in range(20)],
    )
    path = str(tmp_path / "bucketed")
    db.save(path)
    db2 = TriplesDB.load(spark, path)
    assert db2.p_bucketed
    df = select_df(["?o"], [("?s", kw("p1"), "?o")], db2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "p_bucket" in plan and "PartitionFilters: [isnotnull(p_bucket" in plan
    assert df.count() == 10


def test_custom_codec_roundtrip_through_join(spark):
    """Arbitrary host dataclasses as term values via register_term_codec
    (reference accepts any host value, src:54-58, test:234-249)."""
    from dataclasses import dataclass

    from matcha_spark import register_term_codec, unregister_term_codec
    from matcha_spark.terms import from_term, to_term

    @dataclass(frozen=True)
    class Point:
        x: int
        y: int

    with pytest.raises(TypeError):
        to_term(Point(1, 2))

    register_term_codec(
        Point,
        "point",
        lambda p: f"{p.x},{p.y}",
        lambda s: Point(*map(int, s.split(","))),
    )
    try:
        assert from_term(to_term(Point(1, 2))) == Point(1, 2)
        # equal values must equi-join: two triples sharing a Point object
        db = TriplesDB.from_triples(
            spark,
            [
                (kw("a"), kw("at"), Point(1, 2)),
                (kw("b"), kw("at"), Point(1, 2)),
                (kw("c"), kw("at"), Point(9, 9)),
                (kw("a"), kw("label"), "A"),
            ],
        )
        res = select(
            ["?s1", "?s2"],
            [("?s1", kw("at"), "?pt"), ("?s2", kw("at"), "?pt")],
            db,
        )
        assert (kw("a"), kw("b")) in set(res)
        # decode comes back as the host type
        pts = select(["?pt"], [(kw("a"), kw("at"), "?pt")], db)
        assert pts == [Point(1, 2)]
        db.unpersist()
    finally:
        unregister_term_codec(Point)


def test_float_terms_join_across_boundary(spark):
    """Python-side float constants must equi-join Spark-derived double
    terms: equality lives in the num field, not a fragile lexical form."""
    from pyspark.sql import functions as F

    from matcha_spark.functions.termcols import double_col, uri_col
    from matcha_spark.query import select_df
    from matcha_spark.terms import URI, from_term

    vals = [1e20, 1.5e-8, 0.1, 123456789.25]
    rows = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    tri = rows.select(
        uri_col("row:", F.col("id")).alias("s"),
        double_col(F.lit(0.0)).alias("p"),  # predicate: the double 0.0
        double_col(F.col("v")).alias("o"),
    )
    db = TriplesDB.from_df(tri)
    for i, v in enumerate(vals):
        res = select(["?s"], [("?s", 0.0, v)], db)
        assert res == [URI(f"row:{i}")], (v, res)
    # and floats decode back exactly
    got = sorted(select(["?o"], [("?s", 0.0, "?o")], db))
    assert got == sorted(vals)
    db.unpersist()


def test_append_to_store_incremental(spark, tmp_path):
    """Incremental append: dedups against ONLY the touched predicate
    buckets (partition-pruned scan), preserves set semantics, and never
    rewrites existing files."""
    import os

    from matcha_spark import TriplesDB, kw

    path = str(tmp_path / "store")
    base = [(kw(f"s{i}"), kw("p"), i) for i in range(10)] + [
        (kw("x"), kw("q"), "v")
    ]
    TriplesDB.from_triples(spark, base).save(path)

    def files():
        out = []
        for root, _dirs, fs in os.walk(path):
            out += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
        return set(out)

    before = files()
    # delta: 2 duplicates of existing rows + 3 genuinely new
    delta = [
        (kw("s1"), kw("p"), 1),  # dup
        (kw("x"), kw("q"), "v"),  # dup
        (kw("s10"), kw("p"), 10),
        (kw("s11"), kw("p"), 11),
        (kw("y"), kw("r"), 2.5),
    ]
    res = TriplesDB.append_to_store(spark, path, delta)
    assert res == {"appended": 3}
    assert before <= files()  # old files untouched, new ones added
    got = TriplesDB.load(spark, path)
    from matcha_spark import select

    assert len(select(["?s"], [("?s", kw("p"), "?o")], got)) == 12
    assert select(["?o"], [(kw("y"), kw("r"), "?o")], got) == [2.5]
    # idempotent: re-appending the same delta adds nothing
    assert TriplesDB.append_to_store(spark, path, delta) == {"appended": 0}
    # empty delta short-circuits
    assert TriplesDB.append_to_store(spark, path, []) == {"appended": 0}
    # dedup=False skips the store scan entirely (disjoint-delta fast path)
    res2 = TriplesDB.append_to_store(
        spark, path, [(kw("z"), kw("zz"), 1)], dedup=False
    )
    assert res2 == {"appended": 1}
    # guard: an unbucketed parquet dir is rejected
    flat = str(tmp_path / "flat")
    TriplesDB.from_triples(spark, base).df.write.parquet(flat)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TriplesDB.append_to_store(spark, flat, delta)


def test_append_store_scan_is_partition_pruned(spark, tmp_path):
    """The anti-join's store scan must carry a PartitionFilters entry on
    p_bucket — the delta reads only the buckets it touches."""
    from pyspark.sql import functions as F

    from matcha_spark import TriplesDB, kw

    path = str(tmp_path / "store2")
    TriplesDB.from_triples(
        spark, [(kw(f"s{i}"), kw(f"p{i}"), i) for i in range(20)]
    ).save(path)
    plan = (
        spark.read.parquet(path)
        .where(F.col("p_bucket").isin([3, 7]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "p_bucket" in plan.split("PartitionFilters")[1][:120]
