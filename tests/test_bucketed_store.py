"""Subject-bucketed triple store: exchange-free BGP subject self-joins,
single-bucket pruning for ground subjects, float-normalized bucket keys.
"""

import pytest
from pyspark.sql import functions as F

from matcha_spark.db import TriplesDB
from matcha_spark.query import select, select_df
from matcha_spark.terms import kw


@pytest.fixture(scope="module")
def bucketed_db(spark):
    # saveAsTable writes to the session's (static) warehouse dir; tables
    # are dropped on teardown
    triples = []
    for i in range(50):
        triples.append((kw(f":person{i}"), kw(":age"), 20 + i % 30))
        triples.append((kw(f":person{i}"), kw(":likes"), kw(f":thing{i % 7}")))
        triples.append((kw(f":person{i}"), kw(":name"), f"P{i}"))
    mem = TriplesDB.from_triples(spark, triples)
    mem.save_bucketed("bucketed_people", buckets=8)
    db = TriplesDB.load_bucketed(spark, "bucketed_people")
    yield mem, db
    mem.unpersist()
    spark.sql("DROP TABLE IF EXISTS bucketed_people")


def _rows(db, pvars, patterns):
    return select(pvars, patterns, db)


def test_bucketed_results_match_memory(bucketed_db):
    mem, db = bucketed_db
    pat = [
        ("?p", kw(":age"), "?a"),
        ("?p", kw(":likes"), kw(":thing3")),
        ("?p", kw(":name"), "?n"),
    ]
    assert _rows(db, ["?p", "?a", "?n"], pat) == _rows(mem, ["?p", "?a", "?n"], pat)


def test_subject_self_join_has_no_exchange(bucketed_db, spark, monkeypatch):
    """The whole point of the bucketed store: a multi-pattern BGP whose
    patterns share the subject var joins co-partitioned bucketed scans —
    ZERO Exchange nodes in the physical plan.

    The 150-row fixture must emulate at-scale planner conditions: at
    real sizes the compiler wouldn't broadcast (est above threshold) and
    Spark wouldn't auto-disable the bucketed scan, so both small-table
    shortcuts are turned off for the plan check."""
    import matcha_spark.plans.compiler as C

    _, db = bucketed_db
    monkeypatch.setattr(C, "BROADCAST_ROWS", -1)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = select_df(
            ["?p", "?a", "?n"],
            [("?p", kw(":age"), "?a"), ("?p", kw(":name"), "?n")],
            db,
            bag_semantics=True,  # isolate the join (set-dedup adds its own shuffle)
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert df.count() == 50  # and it's still the right answer
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_ground_subject_prunes_to_one_bucket(bucketed_db, spark):
    _, db = bucketed_db
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = select_df(["?a"], [(kw(":person7"), kw(":age"), "?a")], db)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert select(["?a"], [(kw(":person7"), kw(":age"), "?a")], db) == [27]


def test_negative_zero_subject_buckets_with_positive(spark):
    """-0.0 and +0.0 subjects are struct-equal under Spark join
    semantics; the normalized bucket key must agree (raw-bit hashing
    would split them across buckets and silently drop join rows)."""
    mem = TriplesDB.from_triples(
        spark,
        [(-0.0, kw(":p"), 1), (0.0, kw(":q"), 2)],
    )
    mem.save_bucketed("zero_subjects", buckets=4)
    db = TriplesDB.load_bucketed(spark, "zero_subjects")
    try:
        got = select(["?a", "?b"], [("?s", kw(":p"), "?a"), ("?s", kw(":q"), "?b")], db)
        assert got == [(1, 2)]  # the two zero subjects must co-bucket
        ground = select(["?a"], [(0.0, kw(":p"), "?a")], db)
        assert ground == [1]
    finally:
        mem.unpersist()
        spark.sql("DROP TABLE IF EXISTS zero_subjects")


def test_mixed_position_join_still_correct(bucketed_db):
    """A var shared between subject and object positions gets no bucket
    key on the object side — the join must fall back to plain struct
    equality and stay correct."""
    mem, db = bucketed_db
    pat = [
        ("?p", kw(":likes"), "?t"),
        ("?p2", kw(":likes"), "?t"),  # object-object share
        ("?p", kw(":age"), "?a"),
    ]
    assert _rows(db, ["?p", "?p2"], pat) == _rows(mem, ["?p", "?p2"], pat)
