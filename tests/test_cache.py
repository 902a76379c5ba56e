"""memo_persist / cut_lineage: the materialization story behind the
dedup pipeline (computed once, reused across calls, bounded, evictions
unpersisted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matcha_spark import cache as C


def setup_function(_fn):
    C.clear_memo()


def teardown_function(_fn):
    C.clear_memo()


def test_memo_persist_reuses_same_semantics(spark):
    df1 = spark.range(100).withColumn("x", F.col("id") * 2)
    df2 = spark.range(100).withColumn("x", F.col("id") * 2)
    p1 = C.memo_persist(df1)
    p2 = C.memo_persist(df2)  # distinct object, same semantic plan
    assert p1 is p2
    assert p1.storageLevel.useMemory
    assert p1.count() == 100


def test_memo_persist_distinguishes_plans(spark):
    p1 = C.memo_persist(spark.range(10))
    p2 = C.memo_persist(spark.range(20))
    assert p1 is not p2
    assert p1.count() == 10 and p2.count() == 20


def test_memo_persist_bounded_lru_unpersists(spark):
    old_max = C.MEMO_MAX
    C.MEMO_MAX = 2
    try:
        a = C.memo_persist(spark.range(1))
        b = C.memo_persist(spark.range(2))
        c = C.memo_persist(spark.range(3))  # evicts a (LRU)
        assert not a.storageLevel.useMemory, "evicted entry still persisted"
        assert b.storageLevel.useMemory and c.storageLevel.useMemory
        assert len(C._MEMO) == 2
    finally:
        C.MEMO_MAX = old_max


def test_clear_memo_unpersists_all(spark):
    a = C.memo_persist(spark.range(5))
    C.clear_memo()
    assert not a.storageLevel.useMemory
    assert len(C._MEMO) == 0


def test_cut_lineage_localcheckpoint_path(spark):
    # no checkpoint dir configured in the test session → localCheckpoint
    assert spark.sparkContext.getCheckpointDir() is None
    df = C.cut_lineage(spark.range(50).withColumn("y", F.col("id") + 1))
    assert df.count() == 50


def test_cut_lineage_reliable_checkpoint_when_dir_set(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        df = C.cut_lineage(spark.range(7))
        assert df.count() == 7
        assert any((tmp_path / "ckpt").rglob("*")), "no checkpoint files written"
    finally:
        # the test session is shared: restore the no-dir state (py4j
        # name-mangles the Scala setter as checkpointDir_$eq)
        getattr(spark.sparkContext._jsc.sc(), "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.empty()
        )


def test_dedup_pipeline_shares_signature_memo(spark):
    """dedup_near_docs_lsh over the same docs reuses the signatures
    that a prior minhash_lsh_candidates call persisted — the memo key is
    the semantic plan, so the second call must not add a new entry."""
    from matcha_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i}") for i in range(30)],
        "doc_id long, text string",
    )
    D.minhash_lsh_candidates(docs).count()
    n_after_first = len(C._MEMO)
    D.minhash_lsh_candidates(docs).count()
    assert len(C._MEMO) == n_after_first


def test_memo_persist_repersists_externally_unpersisted_hit(spark):
    """r13 (review): a memo hit that something OUTSIDE the module
    unpersisted (the suite graph cache's LRU eviction calls
    .unpersist() on frames that are also memo-tracked) must be
    re-persisted on return, not handed back as a silently-recomputing
    plan — the 'computed once, materialized' contract holds however
    the frame lost its storage."""
    from matcha_spark.cache import clear_memo, memo_persist

    clear_memo()
    a = memo_persist(spark.range(100).selectExpr("id * 3 AS v"))
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    a.unpersist()  # external eviction, memo entry remains
    assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    b = memo_persist(spark.range(100).selectExpr("id * 3 AS v"))
    assert b is a  # still the memoized artifact...
    assert b.storageLevel.useMemory or b.storageLevel.useDisk  # ...restored
    clear_memo()
