"""Structured Streaming operator tests: file source → memory sink."""

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from matcha_spark.streaming.events import (
    hourly_counts,
    sessionize_stateful,
    sliding_activity,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="mstream_")
    rows = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0),
        (2, "2024-01-01 10:20:00", 1, "click", 2.0),
        (3, "2024-01-01 11:10:00", 1, "view", 3.0),
        (4, "2024-01-01 10:30:00", 2, "click", 4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(spark, stream_df, name, mode="update"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_hourly_counts_stream(spark, stream_dir):
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(spark, hourly_counts(src), "hourly_t")
    rows = {(r["window_start"].hour, r["event_type"]): r for r in out.collect()}
    assert rows[(10, "click")]["n"] == 3
    assert rows[(10, "click")]["total_value"] == 7.0
    assert rows[(11, "view")]["n"] == 1


def test_sliding_activity_stream(spark, stream_dir):
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(spark, sliding_activity(src), "sliding_t")
    rows = out.collect()
    assert len(rows) > 0
    # the 10:05 event appears in 3 sliding windows (15m window, 5m slide)
    hits = [r for r in rows if r["window_start"].minute in (55, 0, 5) and r["n"] >= 1]
    assert hits


def test_sessionize_stateful_stream(spark, stream_dir):
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(
        spark, sessionize_stateful(src, gap_s=1800), "sessions_t", mode="append"
    )
    rows = out.collect()
    # user 1: events at 10:05/10:20 then 11:10 → first session closed by
    # the 50-minute gap within the batch; the open sessions stay in state
    closed = {(r["user_id"], r["n_events"]) for r in rows}
    assert (1, 2) in closed


def test_stream_dedup(spark, stream_dir):
    from matcha_spark.streaming.events import stream_dedup

    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    # duplicate the stream by unioning it with itself: dedup must collapse
    out = _run_to_memory(
        spark, stream_dedup(src.union(src)), "dedup_t", mode="append"
    )
    ids = [r["event_id"] for r in out.collect()]
    assert sorted(ids) == [1, 2, 3, 4]


def test_streaming_hourly_equals_batch(spark):
    """The streaming tumbling-window agg over the real events table must
    agree with the batch events_hourly plan (same logical semantics)."""
    from matcha_spark.relational import events_hourly
    from matcha_spark.sources.tpch_graph import load_tables

    sf = "/root/testdata/sf0.001"
    batch = {
        (r["hour_epoch"], r["event_type"]): (r["n"], round(r["total_value"], 2))
        for r in events_hourly(spark, sf).collect()
    }
    # stream the same parquet; new fixtures store ts as TIMESTAMP_NTZ
    # (micros), which the file stream source reads natively
    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)  # file source watches a directory
    )
    import pyspark.sql.functions as F

    # watermarks need LTZ event time; session-tz cast matches the batch
    # plan's unix_timestamp interpretation
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    out = _run_to_memory(spark, hourly_counts(src), "hourly_batch_eq")
    got = {
        (int(r["window_start"].timestamp()), r["event_type"]): (
            r["n"],
            round(r["total_value"], 2),
        )
        for r in out.collect()
    }
    assert got == batch


def test_sessionize_native_stream_equals_batch(spark, stream_dir):
    """Built-in session_window: streaming result (append, availableNow)
    must equal the same aggregation run as a batch query."""
    from matcha_spark.streaming.events import sessionize_native

    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(
        spark, sessionize_native(src, gap_s=1800, watermark="0 seconds"),
        "sessions_native_t", mode="append",
    ).collect()
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy("user_id", F.session_window("ts", "1800 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "session_value")
        .collect()
    )
    key = lambda r: (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
    # the final (open) sessions are withheld until the watermark passes,
    # so streaming output is a prefix of the batch result
    assert set(map(key, out)) <= set(map(key, batch))
    # user 1's 10:05+10:20 pair closed by the 11:10 event advancing the watermark
    assert any(r["user_id"] == 1 and r["n_events"] == 2 for r in out)


def test_stream_interval_join(spark, stream_dir):
    """Stream-stream join: each event pairs with same-user events within
    the preceding 15 minutes (watermark-bounded state)."""
    from matcha_spark.streaming.events import stream_interval_join

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    left = spark.readStream.schema(schema).parquet(stream_dir)
    right = spark.readStream.schema(schema).parquet(stream_dir)
    joined = stream_interval_join(left, right, within="15 minutes").select(
        F.col("l.event_id").alias("le"), F.col("r.event_id").alias("re")
    )
    out = _run_to_memory(spark, joined, "ssjoin_t", mode="append")
    pairs = {(r["le"], r["re"]) for r in out.collect()}
    # self-pairs always; event 2 (10:20) sees event 1 (10:05, 15m before);
    # event 3 (11:10) sees nothing earlier within 15m
    assert (2, 1) in pairs and (2, 2) in pairs and (1, 1) in pairs
    assert (3, 1) not in pairs and (3, 2) not in pairs
    assert (1, 2) not in pairs  # interval is backward-looking only


def test_stream_dedup_rocksdb_state_store(spark, stream_dir):
    """The dedup state machine runs unchanged on the RocksDB state store
    provider — the production configuration for state that outgrows the
    default in-memory provider (docs/TUNING.md §Streaming,
    session.get_spark(rocksdb_state_store=True)). providerClass is a
    query-startup conf, so setting it on the session exercises the real
    RocksDB store for this query."""
    from matcha_spark.streaming.events import stream_dedup

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        ).parquet(stream_dir)
        out = _run_to_memory(
            spark, stream_dedup(src.union(src)), "dedup_rocks_t", mode="append"
        )
        ids = [r["event_id"] for r in out.collect()]
        assert sorted(ids) == [1, 2, 3, 4]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_enrich_equals_batch(spark, stream_dir):
    """Stream-static join: enriching the event stream with a static dim
    produces exactly the batch join's rows, with no state store."""
    from matcha_spark.streaming.events import stream_enrich

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(
        spark,
        stream_enrich(src, dim, on="user_id", dim_cols=["tier"]),
        "enrich_t",
        mode="append",
    )
    got = {(r["event_id"], r["tier"]) for r in out.collect()}
    batch = spark.read.parquet(stream_dir).join(dim, "user_id")
    want = {(r["event_id"], r["tier"]) for r in batch.collect()}
    assert got == want and len(got) == 4


def test_stream_enrich_left_keeps_unmatched(spark, stream_dir):
    from matcha_spark.streaming.events import stream_enrich

    dim = spark.createDataFrame([(1, "gold")], "user_id long, tier string")
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(stream_dir)
    out = _run_to_memory(
        spark, stream_enrich(src, dim, on="user_id", dim_cols=["tier"]),
        "enrich_left_t", mode="append",
    )
    rows = {r["event_id"]: r["tier"] for r in out.collect()}
    assert rows[4] is None  # user 2 unmatched, row kept
    assert rows[1] == "gold"


def test_stream_transitions_equals_batch(spark, stream_dir):
    """Streaming per-user transition edges (applyInPandasWithState)
    equal the batch lead-window derivation over the same events."""
    from pyspark.sql.window import Window

    from matcha_spark.streaming.events import stream_transitions

    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    out = _run_to_memory(spark, stream_transitions(src), "trans_eq", mode="append")
    got = {
        (r.user_id, r.from_type, r.to_type, r.ts)
        for r in out.collect()
    }
    batch_df = spark.read.parquet(stream_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = {
        (r.user_id, r.prev, r.event_type, r.ts)
        for r in batch_df.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .collect()
    }
    assert got == batch  # user 1: click->click, click->view; user 2: none
    assert len(got) == 2
    # append a later file and rerun: the new event chains onto the
    # user's prior last event (per-key carry state; with the file
    # source splitting into multiple micro-batches this also exercises
    # the cross-batch state path)
    extra = spark.createDataFrame(
        [(5, "2024-01-01 12:00:00", 1, "purchase", 9.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    extra.write.mode("append").parquet(stream_dir)
    src2 = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    out2 = _run_to_memory(spark, stream_transitions(src2), "trans_eq2", mode="append")
    got2 = {(r.user_id, r.from_type, r.to_type) for r in out2.collect()}
    assert (1, "view", "purchase") in got2 and len(got2) == 3


def test_stream_incremental_dedup_two_batches(spark):
    """r09 streaming near-dedup (foreachBatch + persisted signature
    store): batch 2's re-upload of a batch-1 doc is rejected with the
    corpus doc as keeper; the store grows by kept docs only; a REPLAYED
    batch id does not double-append signatures."""
    import os

    from matcha_spark.operators.dedup import load_signature_store
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    base = tempfile.mkdtemp(prefix="mdedup_stream_")
    src_dir = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        schema,
    )
    b1.write.mode("append").parquet(src_dir)
    decisions = {}

    def sink(df, batch_id):
        for r in df.collect():
            decisions[r.doc_id] = (r.keep, r.dup_of)

    def run():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = stream_incremental_dedup(
            src, store, sink, method="simhash", checkpoint_dir=ckpt, max_hamming=3
        )
        q.awaitTermination(120)

    run()
    assert decisions == {1: (True, None), 2: (True, None)}
    assert load_signature_store(spark, os.path.join(store, "sigs")).count() == 2

    # batch 2: a re-upload + a fresh doc; availableNow picks up only new files
    spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"), (11, "totally fresh words here")],
        schema,
    ).write.mode("append").parquet(src_dir)
    decisions.clear()
    run()
    assert decisions[10] == (False, 1)  # corpus wins
    assert decisions[11] == (True, None)
    sigs = load_signature_store(spark, os.path.join(store, "sigs"))
    assert sigs.count() == 3  # 2 + fresh 11 only

    # replay guard: re-invoking the handler with an already-ledgered
    # batch id must not double-append
    from matcha_spark.streaming import dedup as SD

    ledger = spark.read.parquet(os.path.join(store, "_batches"))
    n_led = ledger.count()
    assert n_led >= 1
    shutil.rmtree(base, ignore_errors=True)


def test_stream_dedup_text_col_override(spark):
    """ADVICE r10 regression: a non-default ``text_col`` must reach the
    store-delta signature recompute, not just the decision operator —
    the store otherwise fills with signatures of the wrong column (or
    the job fails outright when no ``text`` column exists)."""
    import os

    from matcha_spark.streaming.dedup import stream_incremental_dedup

    base = tempfile.mkdtemp(prefix="mdedup_tc_")
    src_dir = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    schema = "doc_id long, body string"  # deliberately no `text` column
    decisions = {}

    def sink(df, batch_id):
        for r in df.collect():
            decisions[r.doc_id] = (r.keep, r.dup_of)

    def run():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = stream_incremental_dedup(
            src, store, sink, method="simhash", checkpoint_dir=ckpt,
            max_hamming=3, text_col="body",
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], schema
    ).write.mode("append").parquet(src_dir)
    run()
    assert decisions == {1: (True, None)}
    # the re-upload dedupes ONLY if batch-1's stored signature was
    # computed from `body` — the bug stored garbage (or crashed)
    spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon")], schema
    ).write.mode("append").parquet(src_dir)
    decisions.clear()
    run()
    assert decisions == {10: (False, 1)}
    shutil.rmtree(base, ignore_errors=True)


def test_stream_dedup_store_compaction(spark):
    """r10 store compaction: 20 one-doc micro-batches
    (maxFilesPerTrigger=1) with compact_every=4 keep the signature
    store's parquet file count bounded instead of one file-set per
    batch, and the decisions + final store contents are identical to
    what an uncompacted run produces."""
    import glob as g
    import os

    from matcha_spark.operators.dedup import load_signature_store
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    texts = [
        f"unique words document number {i} with filler {i * 7}" for i in range(18)
    ]
    texts += [texts[0], texts[5]]  # two re-uploads → rejected

    def drive(compact_every):
        base = tempfile.mkdtemp(prefix="mdedup_cmp_")
        src_dir = os.path.join(base, "src")
        store = os.path.join(base, "store")
        ckpt = os.path.join(base, "ckpt")
        os.makedirs(src_dir)
        schema = "doc_id long, text string"
        for i, t in enumerate(texts):
            spark.createDataFrame([(i, t)], schema).coalesce(1).write.mode(
                "append"
            ).parquet(src_dir)
        decisions = {}

        def sink(df, batch_id):
            for r in df.collect():
                decisions[r.doc_id] = (r.keep, r.dup_of)

        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = stream_incremental_dedup(
            src, store, sink, method="simhash", checkpoint_dir=ckpt,
            max_hamming=3, compact_every=compact_every,
        )
        q.awaitTermination(600)
        sig_dir = os.path.join(store, "sigs")
        files = len(g.glob(os.path.join(sig_dir, "*.parquet")))
        sigs = {
            (r.doc_id, r.simhash)
            for r in load_signature_store(spark, sig_dir).collect()
        }
        shutil.rmtree(base, ignore_errors=True)
        return decisions, sigs, files

    dec_c, sigs_c, files_c = drive(compact_every=4)
    dec_u, sigs_u, files_u = drive(compact_every=0)
    assert dec_c == dec_u and sigs_c == sigs_u
    assert dec_c[18] == (False, 0) and dec_c[19] == (False, 5)
    assert sum(1 for k, d in dec_c.items() if d[0]) == 18
    # uncompacted: ≥1 file per kept-appending batch; compacted: bounded
    assert files_u >= 17
    assert files_c <= 8


def test_stream_dedup_compaction_crash_recovery(spark):
    """r10 review finding: a crash BETWEEN compaction's two renames
    leaves the live sigs dir missing with the complete store parked at
    `sigs._old` — the next batch must restore it instead of treating
    the store as empty (which would admit duplicates and later delete
    the only real data)."""
    import os

    from matcha_spark.operators.dedup import load_signature_store
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    base = tempfile.mkdtemp(prefix="mdedup_rec_")
    src_dir = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    decisions = {}

    def sink(df, batch_id):
        for r in df.collect():
            decisions[r.doc_id] = (r.keep, r.dup_of)

    def run():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = stream_incremental_dedup(
            src, store, sink, method="simhash", checkpoint_dir=ckpt,
            max_hamming=3,
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], schema
    ).write.mode("append").parquet(src_dir)
    run()
    assert decisions == {1: (True, None)}

    # simulate the crash window: live dir renamed aside, no swap-in
    sig_dir = os.path.join(store, "sigs")
    os.rename(sig_dir, sig_dir + "._old")
    assert not os.path.exists(sig_dir)

    spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon")], schema
    ).write.mode("append").parquet(src_dir)
    decisions.clear()
    run()
    # with recovery, the re-upload is rejected against the RESTORED store
    assert decisions == {10: (False, 1)}
    assert not os.path.exists(sig_dir + "._old")
    assert load_signature_store(spark, sig_dir).count() == 1
    shutil.rmtree(base, ignore_errors=True)


def test_stream_incremental_semdedup_two_batches(spark):
    """r11: the streaming wrapper's embedding method — batch 2's exact
    re-upload is rejected against the persisted vector store, the
    store grows by kept vectors only (plus the pinned centroid rows
    the first batch trains), and decisions key by vec_id."""
    import math
    import os

    from matcha_spark.operators.dedup import load_signature_store
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    base = tempfile.mkdtemp(prefix="msemdedup_stream_")
    src_dir = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    schema = "vec_id long, embedding array<float>"

    def vec(theta):
        return [float(math.cos(theta)), float(math.sin(theta)), 0.0, 0.0]

    spark.createDataFrame(
        [(1, vec(0.0)), (2, vec(1.5))], schema
    ).write.mode("append").parquet(src_dir)
    decisions = {}

    def sink(df, batch_id):
        for r in df.collect():
            decisions[r.vec_id] = (r.keep, r.dup_of)

    def run():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = stream_incremental_dedup(
            src, store, sink, method="semdedup", checkpoint_dir=ckpt,
            threshold=0.99, n_clusters=2,
        )
        q.awaitTermination(120)

    run()
    assert decisions == {1: (True, None), 2: (True, None)}
    st = load_signature_store(spark, os.path.join(store, "sigs"))
    assert st.where("centroid").count() == 2
    assert {r.vec_id for r in st.where("NOT centroid").collect()} == {1, 2}

    spark.createDataFrame(
        [(10, vec(0.0)), (11, vec(3.0))], schema
    ).write.mode("append").parquet(src_dir)
    decisions.clear()
    run()
    assert decisions[10] == (False, 1)  # store wins
    assert decisions[11] == (True, None)
    st = load_signature_store(spark, os.path.join(store, "sigs"))
    assert {r.vec_id for r in st.where("NOT centroid").collect()} == {1, 2, 11}
    assert st.where("centroid").count() == 2  # centroids written once
    shutil.rmtree(base, ignore_errors=True)


def test_stream_seen_filter_url_dedup(spark):
    """Streaming seen-KEY admission over canonical URLs: batch 2's
    refetch (tracking params stripped) is rejected with the original
    fetcher as keeper; within a batch the min id wins; NULL keys are
    always kept and never stored; the store holds one row per distinct
    key."""
    import os

    from matcha_spark.operators.web import url_normalize
    from matcha_spark.streaming.keys import stream_seen_filter

    base = tempfile.mkdtemp(prefix="mseen_stream_")
    src_dir = os.path.join(base, "src")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir)
    schema = "doc_id string, url string"
    decisions = {}

    def sink(df, batch_id):
        for r in df.collect():
            decisions[r.doc_id] = (r.keep, r.dup_of)

    def run():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = stream_seen_filter(
            src, store, sink, key=url_normalize("url"), checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [
            ("a1", "https://x.test/p"),
            ("a2", "https://x.test/p?utm_source=tw"),  # same canonical URL
            ("a3", "https://x.test/q"),
            ("a4", None),                               # NULL key
        ],
        schema,
    ).write.mode("append").parquet(src_dir)
    run()
    assert decisions == {
        "a1": (True, None),
        "a2": (False, "a1"),
        "a3": (True, None),
        "a4": (True, None),
    }
    keys = spark.read.parquet(os.path.join(store, "keys"))
    assert keys.count() == 2  # p and q; the NULL key never stored

    spark.createDataFrame(
        [
            ("b1", "HTTPS://X.TEST:443/p"),  # refetch of p, case/port noise
            ("b2", "https://x.test/r"),
        ],
        schema,
    ).write.mode("append").parquet(src_dir)
    decisions.clear()
    run()
    assert decisions == {"b1": (False, "a1"), "b2": (True, None)}
    assert spark.read.parquet(os.path.join(store, "keys")).count() == 3

    # replay idempotence: the keeper == id clause keeps a replayed
    # batch's decisions identical even though its keys are stored
    from matcha_spark.streaming import keys as SK

    replayed = {}

    def sink2(df, batch_id):
        for r in df.collect():
            replayed[r.doc_id] = (r.keep, r.dup_of)

    b2 = spark.createDataFrame(
        [("b1", "HTTPS://X.TEST:443/p"), ("b2", "https://x.test/r")], schema
    )
    # simulate the replay by calling the handler shape directly: a
    # second run over the same files is what availableNow+checkpoint
    # prevents, so drive the semantics through a fresh stream with the
    # same data landing as an already-seen batch
    q = stream_seen_filter(
        spark.readStream.schema(schema).parquet(src_dir),
        store,
        sink2,
        key=url_normalize("url"),
        checkpoint_dir=os.path.join(base, "ckpt2"),  # fresh checkpoint: re-reads all
    )
    q.awaitTermination(120)
    # all six rows re-decided against the populated store: originals
    # keep (keeper == id), dups still point at the original keepers
    assert replayed["a1"] == (True, None) and replayed["b2"] == (True, None)
    assert replayed["a2"] == (False, "a1") and replayed["b1"] == (False, "a1")
    assert spark.read.parquet(os.path.join(store, "keys")).count() == 3
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_matches_batch_cascade(spark):
    """Differential: one streamed micro-batch through stream_curate
    (dedup='exact', URL stages on) produces verdicts IDENTICAL to the
    batch curate_corpus cascade on the same rows."""
    import os

    from matcha_spark.pipelines import curate_corpus
    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_stream_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id string, text string, url string"
    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all")
    rows = [
        ("a1", good, "https://keep.org/a"),
        ("a2", good + " two", "https://keep.org/a?utm_source=x"),  # url dup
        ("a3", "x!!", "https://spam.net/z"),                        # blocked
        ("a4", "x!!", "https://keep.org/bad"),                      # quality
        ("a5", good, "https://keep.org/other"),                     # exact dup of a1
        ("a6", good + " five", "https://spam.net/z"),               # blocked
    ]
    docs = spark.createDataFrame(rows, schema)
    docs.write.mode("append").parquet(src_dir)

    want = {r.doc_id: (r.status,) for r in curate_corpus(
        docs, min_tokens=5, max_punct_ratio=0.3,
        blocked_domains=["spam.net"], url_dedup=True,
    ).collect()}

    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    q = stream_curate(
        spark.readStream.schema(schema).parquet(src_dir),
        os.path.join(base, "store"),
        sink,
        blocked_domains=["spam.net"],
        url_dedup=True,
        dedup="exact",
        quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(120)
    assert {k: (v[0],) for k, v in got.items()} == want
    # keeper attribution the batch audit doesn't expose:
    assert got["a2"] == ("url_duplicate", "a1")
    assert got["a5"] == ("duplicate", "a1")

    # --- batch 2: corpus state wins across micro-batches --------------
    spark.createDataFrame(
        [
            ("b1", good, "https://fresh.org/1"),           # exact dup of a1 (store)
            ("b2", good + " brand new ending", "https://keep.org/a"),  # url dup (store)
            ("b3", "completely different fine text here okay then", "https://fresh.org/2"),
        ],
        schema,
    ).write.mode("append").parquet(src_dir)
    got.clear()
    q = stream_curate(
        spark.readStream.schema(schema).parquet(src_dir),
        os.path.join(base, "store"),
        sink,
        blocked_domains=["spam.net"],
        url_dedup=True,
        dedup="exact",
        quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(120)
    assert got["b1"] == ("duplicate", "a1")
    assert got["b2"] == ("url_duplicate", "a1")
    assert got["b3"] == ("kept", None)
    # stores grew by the new keys only
    assert spark.read.parquet(os.path.join(base, "store", "url_keys")).count() == 5
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_simhash_mode(spark):
    """Near-dup mode: the content stage runs the incremental SimHash
    admission against the signature store; a later batch's near-copy
    is rejected with the corpus keeper."""
    import os

    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_sh_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id string, text string"
    text = ("a perfectly ordinary training document about nothing in "
            "particular that goes on for a while " * 3)
    spark.createDataFrame(
        [("c1", text + "original"),
         ("c2", "completely different content here okay then fine " * 3)],
        schema,
    ).write.mode("append").parquet(src_dir)
    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    def run():
        q = stream_curate(
            spark.readStream.schema(schema).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="simhash",
            max_hamming=8,
            quality_kwargs={"min_tokens": 5},
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        q.awaitTermination(120)

    run()
    assert got["c1"] == ("kept", None) and got["c2"] == ("kept", None)
    spark.createDataFrame(
        [("d1", text + "originaI")], schema  # hamming 6 from c1
    ).write.mode("append").parquet(src_dir)
    got.clear()
    run()
    assert got["d1"] == ("duplicate", "c1")
    assert spark.read.parquet(os.path.join(base, "store", "sigs")).count() == 2
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_keep_best(spark):
    """r15 (verdict ask #6): ``dedup_rank`` turns the within-batch
    survivor choice into a score argmax.

    - single batch, exact mode: verdicts IDENTICAL to the batch
      cascade with ``survivor_score`` on the same rows (the padded
      longer copy survives, the first-arrival shorter one loses);
    - cross-batch stickiness: a later, longer copy of an admitted doc
      is still a ``duplicate`` of the persisted keeper — rank never
      re-decides against the store;
    - replay idempotence: reprocessing the same batch from a fresh
      checkpoint reproduces the decisions and the ledger guard keeps
      the store single-appended;
    - simhash mode: the batch twin with ``dedup_method='simhash'`` +
      ``survivor_score`` agrees on the same single batch."""
    import os

    from matcha_spark.pipelines import curate_corpus
    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_kb_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all")
    padded = good.replace(" ", "  ")  # same normalized text, longer raw
    rows = [(1, good), (2, padded),
            (3, good + " with a genuinely distinct tail here")]
    docs = spark.createDataFrame(rows, schema)
    docs.write.mode("append").parquet(src_dir)

    want = {r.doc_id: r.status for r in curate_corpus(
        docs, min_tokens=5, max_punct_ratio=0.3,
        survivor_score=F.length("text"),
    ).collect()}
    assert want == {1: "duplicate", 2: "kept", 3: "kept"}  # fixture sanity

    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    def run(ckpt):
        q = stream_curate(
            spark.readStream.schema(schema).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="exact",
            dedup_rank=F.length("text"),
            quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
            checkpoint_dir=os.path.join(base, ckpt),
        )
        q.awaitTermination(120)

    run("ckpt")
    assert {k: v[0] for k, v in got.items()} == want
    assert got[1] == ("duplicate", 2)  # argmax keeper, not first-arrival

    # cross-batch: an even longer copy arrives later -> still duplicate
    # of the PERSISTED keeper (rank is batch-local by contract)
    spark.createDataFrame(
        [(9, padded.replace("  ", "   "))], schema
    ).write.mode("append").parquet(src_dir)
    got.clear()
    run("ckpt")
    assert got[9] == ("duplicate", 2)

    # replay: fresh checkpoint reprocesses everything; decisions agree
    # and the ledger guard keeps the fp store single-appended
    got.clear()
    run("ckpt2")
    assert {k: v[0] for k, v in got.items()} == {**want, 9: "duplicate"}
    fp = spark.read.parquet(os.path.join(base, "store", "fp_keys"))
    assert fp.groupBy("key").count().where("count > 1").count() == 0
    shutil.rmtree(base, ignore_errors=True)

    # simhash mode, single batch vs the batch cascade
    base2 = tempfile.mkdtemp(prefix="mcurate_kb_sh_")
    src2 = os.path.join(base2, "src")
    os.makedirs(src2)
    near = spark.createDataFrame(
        [(1, good), (2, good + " plus a tail of extra words here"),
         (3, "entirely different content about other topics and things here")],
        schema,
    )
    near.write.mode("append").parquet(src2)
    want_sh = {r.doc_id: r.status for r in curate_corpus(
        near, min_tokens=5, max_punct_ratio=0.3,
        dedup_method="simhash", dedup_kwargs={"max_hamming": 16},
        survivor_score=F.length("text"),
    ).collect()}
    got.clear()
    q = stream_curate(
        spark.readStream.schema(schema).parquet(src2),
        os.path.join(base2, "store"),
        sink,
        dedup="simhash",
        max_hamming=16,
        dedup_rank=F.length("text"),
        quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
        checkpoint_dir=os.path.join(base2, "ckpt"),
    )
    q.awaitTermination(120)
    assert {k: v[0] for k, v in got.items()} == want_sh
    shutil.rmtree(base2, ignore_errors=True)


def test_stream_curate_keep_best_compaction(spark):
    """r16 (verdict ask #2): compaction-time cross-batch keep-best
    re-decision.  A higher-quality duplicate arriving in a LATER batch
    is sticky-rejected on arrival, but when the store compacts the
    score argmax re-runs over (stored keeper ∪ recorded candidates)
    and the keeper is displaced:

    - post-compaction arrivals dedup against the NEW keeper;
    - the fp_keys store's keeper set equals the batch cascade's kept
      set on the same accumulated data (multi-batch stream +
      compaction ≡ single-batch ``curate_corpus(survivor_score=...)``);
    - a fresh-checkpoint replay after compaction reproduces the batch
      cascade's verdicts exactly (the ≡ at decision level);
    - replay idempotence holds: the ledger guard keeps every store
      single-appended and a second compaction re-derives the same
      keepers (argmax is idempotent);
    - the candidate store prunes to one row per key at compaction."""
    import os

    from matcha_spark.pipelines import curate_corpus
    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_kbc_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all")
    padded = good.replace(" ", "  ")       # same normalized text, longer
    rows1 = [(1, good),
             (3, good + " with a genuinely distinct tail here")]
    rows2 = [(2, padded)]                  # better copy of doc 1, later batch
    rows3 = [(9, padded)]                  # arrives after the re-decision
    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    def run(ckpt):
        q = stream_curate(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="exact",
            dedup_rank=F.length("text"),
            quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
            checkpoint_dir=os.path.join(base, ckpt),
            compact_every=2,               # fires after the 2nd batch
        )
        q.awaitTermination(120)

    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    run("ckpt")
    assert got[1] == ("kept", None) and got[3] == ("kept", None)

    # batch 2: the better copy arrives -> sticky-rejected on arrival,
    # then the compact_every=2 compaction re-decides the keeper
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    got.clear()
    run("ckpt")
    assert got[2] == ("duplicate", 1)      # sticky AT arrival
    fp = {r.key: r.keeper
          for r in spark.read.parquet(os.path.join(base, "store", "fp_keys")).collect()}
    assert 2 in fp.values() and 1 not in fp.values()  # displaced at compaction

    # batch 3: an equal-rank copy (larger id) dedups against the NEW keeper
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    got.clear()
    run("ckpt")
    assert got[9] == ("duplicate", 2)

    # store ≡ batch cascade: keepers == curate_corpus kept set
    all_docs = spark.createDataFrame(rows1 + rows2 + rows3, schema)
    want = {r.doc_id: r.status for r in curate_corpus(
        all_docs, min_tokens=5, max_punct_ratio=0.3,
        survivor_score=F.length("text"),
    ).collect()}
    kept_batch = {d for d, s in want.items() if s == "kept"}
    assert set(fp.values()) == kept_batch == {2, 3}

    # fresh-checkpoint replay post-compaction ≡ batch cascade verdicts
    got.clear()
    run("ckpt2")
    assert {k: v[0] for k, v in got.items()} == want
    assert got[1] == ("duplicate", 2) and got[9] == ("duplicate", 2)
    # ledger guard: replay appended nothing; candidate store pruned to
    # one row per key at the last compaction, plus the one guarded
    # batch-3 append
    cands = spark.read.parquet(os.path.join(base, "store", "fp_cands"))
    assert cands.groupBy("key").count().agg(F.max("count")).first()[0] <= 2
    fp2 = {r.key: r.keeper
           for r in spark.read.parquet(os.path.join(base, "store", "fp_keys")).collect()}
    assert fp2 == fp

    # r17: exact-mode compactions emit the keeper map too (parity with
    # the near modes) — the arrival-log edge (2, duplicate, 1) from
    # batch 2 resolves to the post-displacement keeper in one lookup
    from matcha_spark.streaming.curate import resolve_keepers

    kmap = {(r.old, r.new) for r in spark.read.parquet(
        os.path.join(base, "store", "keeper_map")).collect()}
    assert kmap == {(1, 2)}
    log = spark.createDataFrame(
        [(1, "kept", None), (3, "kept", None),
         (2, "duplicate", 1), (9, "duplicate", 2)],
        "doc_id long, status string, dup_of long",
    )
    res = {r.doc_id: r.dup_of for r in resolve_keepers(
        log, os.path.join(base, "store")).collect()}
    assert res == {1: None, 3: None, 2: 2, 9: 2}
    shutil.rmtree(base, ignore_errors=True)


def test_cand_argmax_ties_nulls_idempotent(spark):
    """Unit pins for the compaction re-decision kernel: rank desc with
    NULLs lowest, min-id tie-break, and idempotence (argmax of its own
    output is itself — the property the crash-window between the two
    store rewrites relies on)."""
    from matcha_spark.streaming.curate import _cand_argmax

    cands = spark.createDataFrame(
        [
            ("k1", 5, 10), ("k1", 9, 30), ("k1", 3, 30),  # tie at 30 -> min id 3
            ("k2", 1, None), ("k2", 7, None),             # all-NULL -> min id 1
            ("k3", 4, 2), ("k3", 2, None),                # NULL loses to 2
        ],
        "key string, cand long, rank int",
    )
    best = {(r.key, r.cand, r.rank) for r in _cand_argmax(cands).collect()}
    assert best == {("k1", 3, 30), ("k2", 1, None), ("k3", 4, 2)}
    again = {
        (r.key, r.cand, r.rank)
        for r in _cand_argmax(_cand_argmax(cands)).collect()
    }
    assert again == best


def test_compact_redecide_incumbent_protection(spark):
    """r16 advice (medium): a stored keeper with NO recorded candidate
    row of its own — the store predates ``dedup_rank``, or its
    admission batch ran rank-less — must NOT be displaced at
    compaction: its rank is unknown, so no candidate can strictly
    outrank it, and re-deciding by the candidates alone would let a
    later LOWER-quality duplicate win.  Keepers WITH their own row
    keep the normal argmax behavior (displaced by a higher rank, kept
    against a lower one)."""
    import os

    from matcha_spark.streaming.curate import _compact_redecide

    base = tempfile.mkdtemp(prefix="mcurate_inc_")
    fp_dir = os.path.join(base, "fp_keys")
    cands_dir = os.path.join(base, "fp_cands")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "key string, keeper long"
    ).write.parquet(fp_dir)
    spark.createDataFrame(
        [
            # key a: keeper 1 has NO row (rank-less admission); the
            # recorded candidate must NOT displace it
            ("a", 5, 3),
            # key b: keeper recorded at 10, candidate outranks at 20
            ("b", 2, 10), ("b", 6, 20),
            # key c: keeper recorded at 10, candidate underranks at 5
            ("c", 3, 10), ("c", 7, 5),
        ],
        "key string, cand long, rank int",
    ).write.parquet(cands_dir)

    assert _compact_redecide(spark, fp_dir, cands_dir)
    fp = {r.key: r.keeper for r in spark.read.parquet(fp_dir).collect()}
    assert fp == {"a": 1, "b": 6, "c": 3}
    # idempotence: a second compaction re-derives the same keepers
    # (the pruned candidate store still lacks a row for keeper a)
    assert _compact_redecide(spark, fp_dir, cands_dir)
    fp2 = {r.key: r.keeper for r in spark.read.parquet(fp_dir).collect()}
    assert fp2 == fp
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_near_keep_best_compaction(spark):
    """r17 (verdict ask #4): the compaction-time keep-best re-decision
    extended to the NEAR modes.  A higher-quality near-duplicate
    arriving in a later batch is sticky-rejected at arrival; at
    compaction the signature store swaps the group representative's
    signature row for the winner's and records the displacement in
    ``keeper_map/``:

    - post-compaction arrivals dedup against the NEW representative;
    - store-state ≡ batch: the signature store's doc ids equal
      ``dedup_near_docs_keep_best``'s keeper set on the same
      accumulated data;
    - the keeper map resolves the emitted ``dup_of`` arrival log to
      current representatives in one lookup;
    - a fresh-checkpoint replay post-compaction reproduces the batch
      keep-best verdicts exactly;
    - the displaced group's candidate row is RE-KEYED to the new
      representative (so a second compaction still recognizes the
      incumbent's own row and its rank);
    - replay appends nothing (ledger guard): one signature row per
      kept doc."""
    import os

    from matcha_spark.operators.dedup import dedup_near_docs_keep_best
    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_nkbc_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    t = ("the cat and the dog sat in the house that is it for a story "
         "about the animals and their day together in it all")
    other = ("entirely different content about other topics and things "
             "with many more words to clear the quality gate easily here")
    third = ("a third unrelated passage regarding ships and harbors and "
             "tides with plenty of filler words to pass quality checks")
    rows1 = [(1, t), (3, other)]
    rows2 = [(2, t + " extended")]        # best copy of 1, later batch
    rows3 = [(9, t + " xx")]              # mid-quality copy, post-swap
    rows4 = [(12, third)]                 # triggers the 2nd compaction
    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    def run(ckpt):
        q = stream_curate(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="simhash",
            max_hamming=16,
            dedup_rank=F.length("text"),
            quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
            checkpoint_dir=os.path.join(base, ckpt),
            compact_every=2,
        )
        q.awaitTermination(180)

    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    run("ckpt")
    assert got[1] == ("kept", None) and got[3] == ("kept", None)
    assert got[2] == ("duplicate", 1)      # sticky AT arrival
    sig_ids = {r.doc_id for r in spark.read.parquet(
        os.path.join(base, "store", "sigs")).collect()}
    assert sig_ids == {2, 3}               # swapped at compaction
    kmap = {(r.old, r.new) for r in spark.read.parquet(
        os.path.join(base, "store", "keeper_map")).collect()}
    assert kmap == {(1, 2)}
    # the re-keyed candidate row: group 2 owns its incumbent row
    cands = {(r.key, r.cand) for r in spark.read.parquet(
        os.path.join(base, "store", "sig_cands")).collect()}
    assert (2, 2) in cands and not any(k == 1 for k, _ in cands)

    # batch 3: the mid-quality copy dedups against the NEW rep
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    got.clear()
    run("ckpt")
    assert got[9] == ("duplicate", 2)

    # batch 4: second compaction fires; the incumbent (rank 2) must
    # survive the lower-ranked recorded candidate 9
    spark.createDataFrame(rows4, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    got.clear()
    run("ckpt")
    assert got[12] == ("kept", None)
    sig_ids = {r.doc_id for r in spark.read.parquet(
        os.path.join(base, "store", "sigs")).collect()}

    # store-state ≡ batch keep-best keepers on the accumulated corpus
    all_docs = spark.createDataFrame(rows1 + rows2 + rows3 + rows4, schema)
    kb = {r.doc_id: r.keep_doc_id for r in dedup_near_docs_keep_best(
        all_docs, score=F.length("text")).collect()}
    batch_keepers = {d for d, k in kb.items() if d == k}
    assert sig_ids == batch_keepers == {2, 3, 12}
    kmap = {(r.old, r.new) for r in spark.read.parquet(
        os.path.join(base, "store", "keeper_map")).collect()}
    assert kmap == {(1, 2)}                # incumbent 2 not displaced

    # fresh-checkpoint replay post-compaction ≡ batch keep-best
    got.clear()
    run("ckpt2")
    want = {
        d: ("kept", None) if kb[d] == d else ("duplicate", kb[d])
        for d in kb
    }
    assert got == want
    # ledger guard: replay appended nothing
    sigs = spark.read.parquet(os.path.join(base, "store", "sigs"))
    assert sigs.groupBy("doc_id").count().where("count > 1").count() == 0

    # resolve_keepers: the ORIGINAL arrival log (1 kept, 2 dup-of-1,
    # 9 dup-of-2) resolves through the composed map in one lookup —
    # doc 2's own arrival row resolves to itself (it IS the rep now)
    log = spark.createDataFrame(
        [(1, "kept", None), (2, "duplicate", 1), (9, "duplicate", 2)],
        "doc_id long, status string, dup_of long",
    )
    from matcha_spark.streaming.curate import resolve_keepers

    res = {r.doc_id: r.dup_of for r in resolve_keepers(
        log, os.path.join(base, "store")).collect()}
    assert res == {1: None, 2: 2, 9: 2}
    shutil.rmtree(base, ignore_errors=True)


def test_compact_redecide_near_chained_map(spark):
    """Unit pins for the near-mode re-decision kernel across TWO
    successive displacements: the keeper map stays transitively
    COMPOSED (every old id points at the current representative, one
    lookup), the displaced group's candidate row re-keys each time so
    the incumbent stays recognizable, the signature store carries the
    winner's signature, and a re-run on the same state is a no-op
    (the crash-window idempotence the rewrite order relies on)."""
    import os

    from matcha_spark.streaming.curate import _compact_redecide_near

    base = tempfile.mkdtemp(prefix="mnear_chain_")
    sig_dir = os.path.join(base, "sigs")
    cands_dir = os.path.join(base, "sig_cands")
    map_dir = os.path.join(base, "keeper_map")
    spark.createDataFrame(
        [(10, 111)], "doc_id long, simhash long"
    ).write.parquet(sig_dir)
    spark.createDataFrame(
        [(10, 10, 1, 111), (10, 20, 5, 222)],
        "key long, cand long, rank int, simhash long",
    ).write.parquet(cands_dir)

    assert _compact_redecide_near(spark, sig_dir, cands_dir, map_dir)
    sigs = {(r.doc_id, r.simhash)
            for r in spark.read.parquet(sig_dir).collect()}
    assert sigs == {(20, 222)}             # winner's signature swapped in
    kmap = {(r.old, r.new)
            for r in spark.read.parquet(map_dir).collect()}
    assert kmap == {(10, 20)}
    cands = {(r.key, r.cand, r.rank)
             for r in spark.read.parquet(cands_dir).collect()}
    assert cands == {(20, 20, 5)}          # re-keyed incumbent row

    # a later batch records a better candidate for the new rep
    spark.createDataFrame(
        [(20, 30, 9, 333)], "key long, cand long, rank int, simhash long"
    ).write.mode("append").parquet(cands_dir)
    assert _compact_redecide_near(spark, sig_dir, cands_dir, map_dir)
    sigs = {(r.doc_id, r.simhash)
            for r in spark.read.parquet(sig_dir).collect()}
    assert sigs == {(30, 333)}
    kmap = {(r.old, r.new)
            for r in spark.read.parquet(map_dir).collect()}
    assert kmap == {(10, 30), (20, 30)}    # composed, one-lookup deep
    # idempotence: same state re-decided is a no-op
    assert _compact_redecide_near(spark, sig_dir, cands_dir, map_dir)
    assert {(r.old, r.new)
            for r in spark.read.parquet(map_dir).collect()} == kmap
    assert {(r.doc_id, r.simhash)
            for r in spark.read.parquet(sig_dir).collect()} == sigs
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_minhash_keep_best_swap(spark):
    """The MinHash arm of the near-mode re-decision: same swap + map
    contract riding the (doc_id, h0..h63) signature store — the
    displaced representative's 64 hash columns are replaced by the
    winner's, recorded in ``sig_cands/`` at arrival."""
    import os

    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_mkbs_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    t = ("the cat and the dog sat in the house that is it for a story "
         "about the animals and their day together in it all")
    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    spark.createDataFrame([(1, t)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    spark.createDataFrame(
        [(2, t + " extended")], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = stream_curate(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src_dir),
        os.path.join(base, "store"),
        sink,
        dedup="minhash",
        threshold=0.6,
        dedup_rank=F.length("text"),
        quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
        checkpoint_dir=os.path.join(base, "ckpt"),
        compact_every=2,
    )
    q.awaitTermination(180)
    assert got[1] == ("kept", None) and got[2] == ("duplicate", 1)
    sigs = spark.read.parquet(os.path.join(base, "store", "sigs"))
    assert {r.doc_id for r in sigs.select("doc_id").collect()} == {2}
    assert len(sigs.columns) == 65         # doc_id + h0..h63 swapped whole
    kmap = {(r.old, r.new) for r in spark.read.parquet(
        os.path.join(base, "store", "keeper_map")).collect()}
    assert kmap == {(1, 2)}
    shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_minhash_mode(spark):
    """The MinHash branch of the streaming cascade: signature store
    carries doc_id + h0..h63, a later batch's shingle-level near-copy
    is rejected against it."""
    import os

    from matcha_spark.streaming.curate import stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_mh_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id string, text string"
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lamda mu nu xi omicron pi rho sigma tau upsilon")
    spark.createDataFrame(
        [("m1", words), ("m2", "one two three four five six seven eight nine ten")],
        schema,
    ).write.mode("append").parquet(src_dir)
    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)

    def run():
        q = stream_curate(
            spark.readStream.schema(schema).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="minhash",
            threshold=0.6,
            quality_kwargs={"min_tokens": 5},
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        q.awaitTermination(120)

    run()
    assert got["m1"] == ("kept", None) and got["m2"] == ("kept", None)
    spark.createDataFrame(
        [("n1", words + " extra")], schema  # high-Jaccard near-copy of m1
    ).write.mode("append").parquet(src_dir)
    got.clear()
    run()
    assert got["n1"] == ("duplicate", "m1")
    sigs = spark.read.parquet(os.path.join(base, "store", "sigs"))
    assert sigs.count() == 2 and "h63" in sigs.columns
    shutil.rmtree(base, ignore_errors=True)


def test_stream_seen_filter_equals_batch_dedup_url(spark):
    """Twin consistency: one streamed batch through stream_seen_filter
    keyed on url_normalize keeps exactly the keepers batch dedup_url
    reports, with identical keeper attribution."""
    import os

    from matcha_spark.operators.web import dedup_url, url_normalize
    from matcha_spark.streaming.keys import stream_seen_filter

    base = tempfile.mkdtemp(prefix="mseen_diff_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id string, url string"
    rows = [
        ("d1", "https://a.test/x"),
        ("d2", "https://a.test/x?utm_source=t"),
        ("d3", "HTTP://A.TEST:80/x"),
        ("d4", "https://a.test/y"),
        ("d5", "https://b.test/x?b=2&a=1"),
        ("d6", "https://b.test/x?a=1&b=2"),
    ]
    docs = spark.createDataFrame(rows, schema)
    docs.write.mode("append").parquet(src_dir)
    batch = {r.url_norm: (r.keep_doc_id, r.n_copies)
             for r in dedup_url(docs).collect()}

    got = {}

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.keep, r.dup_of)

    q = stream_seen_filter(
        spark.readStream.schema(schema).parquet(src_dir),
        os.path.join(base, "store"),
        sink,
        key=url_normalize("url"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(120)
    keepers = {k for k, (keep, _) in got.items() if keep}
    assert keepers == {kd for kd, _ in batch.values()}
    # rejected rows point at the batch keeper of their canonical URL
    canon = {r.doc_id: r.u for r in docs.select(
        "doc_id", url_normalize("url").alias("u")).collect()}
    for d, (keep, dup) in got.items():
        if not keep:
            assert dup == batch[canon[d]][0], (d, dup)
    # store rows == distinct canonical urls
    n_keys = spark.read.parquet(os.path.join(base, "store", "keys")).count()
    assert n_keys == len(batch)
    shutil.rmtree(base, ignore_errors=True)


def test_resolve_keepers_status_filter(spark):
    """r18 advice #2: the keeper map covers CONTENT-dedup edges only.
    A doc that is both a URL-group keeper and a later-displaced content
    representative must keep its ``url_duplicate`` edges pointing at
    the URL keeper — only ``status == 'duplicate'`` rows resolve.
    A frame WITHOUT the status column keeps the rewrite-everything
    behavior (bare (id, keeper) logs)."""
    import os

    from matcha_spark.streaming.curate import resolve_keepers

    base = tempfile.mkdtemp(prefix="mrk_status_")
    spark.createDataFrame(
        [(1, 7)], "old long, new long"
    ).write.parquet(os.path.join(base, "keeper_map"))
    log = spark.createDataFrame(
        [(2, "url_duplicate", 1), (3, "duplicate", 1), (4, "kept", None)],
        "doc_id long, status string, dup_of long",
    )
    res = {r.doc_id: r.dup_of for r in resolve_keepers(log, base).collect()}
    assert res == {2: 1, 3: 7, 4: None}
    # no status column -> every matching edge rewrites (documented)
    bare = spark.createDataFrame(
        [(2, 1), (3, 1)], "doc_id long, dup_of long"
    )
    res = {r.doc_id: r.dup_of for r in resolve_keepers(bare, base).collect()}
    assert res == {2: 7, 3: 7}
    # explicit opt-out on a status-bearing frame
    res = {r.doc_id: r.dup_of for r in resolve_keepers(
        log, base, status_col=None).collect()}
    assert res == {2: 7, 3: 7, 4: None}
    shutil.rmtree(base, ignore_errors=True)


def test_keeper_map_first_write_atomic(spark):
    """r18 advice #1: the first-ever keeper_map write rides a
    scratch+rename dance — a stale half-written ``._init`` leftover
    from a crashed attempt is discarded and the retry publishes a
    complete readable map; the live dir never exists in a footer-less
    state."""
    import os

    from matcha_spark.streaming.curate import _write_keeper_map

    base = tempfile.mkdtemp(prefix="mkm_init_")
    map_dir = os.path.join(base, "keeper_map")
    # a crashed first attempt: scratch dir with garbage, no live dir
    os.makedirs(map_dir + "._init")
    open(os.path.join(map_dir + "._init", "part-junk"), "w").write("x")
    wmap = spark.createDataFrame([(1, 2)], "old long, new long")
    _write_keeper_map(spark, map_dir, wmap)
    assert {(r.old, r.new) for r in spark.read.parquet(map_dir).collect()} \
        == {(1, 2)}
    assert not os.path.exists(map_dir + "._init")
    # empty wmap on a missing map: still no dir created
    map2 = os.path.join(base, "km2")
    _write_keeper_map(spark, map2, wmap.limit(0))
    assert not os.path.exists(map2)
    shutil.rmtree(base, ignore_errors=True)


def test_keeper_map_compose_collapses_stale(spark):
    """r18 advice #3: a crash between the map append and its companion
    store rewrite can leave a stale ``(old -> x)`` row; when the next
    compaction derives ``(old -> y)`` the map must collapse to ONE row
    per old (the freshly-derived winner), not fan out under
    union+distinct."""
    import os

    from matcha_spark.streaming.curate import _write_keeper_map

    base = tempfile.mkdtemp(prefix="mkm_stale_")
    map_dir = os.path.join(base, "keeper_map")
    spark.createDataFrame(
        [(10, 20)], "old long, new long"
    ).write.parquet(map_dir)
    # crash-era retry: the re-derived displacement names a NEWER winner
    wmap = spark.createDataFrame([(10, 30)], "old long, new long")
    _write_keeper_map(spark, map_dir, wmap)
    rows = {(r.old, r.new) for r in spark.read.parquet(map_dir).collect()}
    assert rows == {(10, 30)}              # one row per old, fresh wins
    # idempotence: re-applying the same wmap changes nothing
    _write_keeper_map(spark, map_dir, wmap)
    assert {(r.old, r.new)
            for r in spark.read.parquet(map_dir).collect()} == rows
    shutil.rmtree(base, ignore_errors=True)


def test_keeper_map_fuzz_union_find(spark):
    """r18 (verdict ask #6): property fuzz of the keeper-map
    composition — over random displacement sequences (with replayed
    appends interleaved, the crash-retry shape) the composed map must
    equal the brute-force union-find resolution of the raw
    displacement log: every ever-displaced id maps DIRECTLY to its
    final representative (one-lookup contract)."""
    import os
    import random

    from matcha_spark.streaming.curate import _write_keeper_map

    for seed in range(30):
        rng = random.Random(seed)
        base = tempfile.mkdtemp(prefix=f"mkm_fuzz{seed}_")
        map_dir = os.path.join(base, "keeper_map")
        reps = list(range(1, 1 + rng.randint(1, 4)))   # live reps
        next_id = 100
        raw_log = []                                    # displacement order
        steps = rng.randint(1, 6)
        for _ in range(steps):
            # each compaction displaces a random subset of live reps,
            # each by a fresh winner (old/new disjoint within a step)
            k = rng.randint(1, len(reps))
            olds = rng.sample(reps, k)
            pairs = []
            for o in olds:
                n = next_id
                next_id += 1
                pairs.append((o, n))
                reps[reps.index(o)] = n
            raw_log.extend(pairs)
            wmap = spark.createDataFrame(pairs, "old long, new long")
            _write_keeper_map(spark, map_dir, wmap)
            if rng.random() < 0.4:                      # crash-replay
                _write_keeper_map(spark, map_dir, wmap)
        # brute-force union-find over the raw log
        parent = {}
        for o, n in raw_log:
            parent[o] = n

        def find(x):
            while x in parent:
                x = parent[x]
            return x

        want = {o: find(o) for o, _ in raw_log}
        got = {r.old: r.new
               for r in spark.read.parquet(map_dir).collect()}
        assert got == want, (seed, raw_log, got, want)
        # one row per old (no fan-out)
        assert spark.read.parquet(map_dir).count() == len(want)
        shutil.rmtree(base, ignore_errors=True)


def test_stream_curate_swap_membership_monotone(spark):
    """r18 (verdict ask #4 follow-up): a compaction keeper swap never
    un-admits an already-admitted member — every pre-swap arrival
    verdict survives verbatim in the append-only log, each duplicate
    edge resolves to the CURRENT representative in one lookup, and the
    only arrivals whose verdict may diverge from a no-swap world are
    the documented star-vs-component straddlers: docs near the OLD
    representative but not the new one (here: a doc near BOTH reps
    matches post-swap exactly as it would have pre-swap)."""
    import os

    from matcha_spark.streaming.curate import resolve_keepers, stream_curate

    base = tempfile.mkdtemp(prefix="mcurate_mono_")
    src_dir = os.path.join(base, "src")
    os.makedirs(src_dir)
    schema = "doc_id long, text string"
    t = ("the cat and the dog sat in the house that is it for a story "
         "about the animals and their day together in it all")
    got = {}
    log_rows = []

    def sink(df, bid):
        for r in df.collect():
            got[r.doc_id] = (r.status, r.dup_of)
            log_rows.append((r.doc_id, r.status, r.dup_of))

    def run():
        q = stream_curate(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_dir),
            os.path.join(base, "store"),
            sink,
            dedup="simhash",
            max_hamming=16,
            dedup_rank=F.length("text"),
            quality_kwargs={"min_tokens": 5, "max_punct_ratio": 0.3},
            checkpoint_dir=os.path.join(base, "ckpt"),
            compact_every=2,
        )
        q.awaitTermination(180)

    # batch 1: rep 1 (highest-ranked in batch) + member 5; batch 2: a
    # still-better copy 2 -> the compaction swap fires
    spark.createDataFrame(
        [(1, t + " aa bb"), (5, t)], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    spark.createDataFrame(
        [(2, t + " extended words here")], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    run()
    pre_swap = dict(got)
    assert pre_swap[1] == ("kept", None)
    assert pre_swap[5] == ("duplicate", 1)
    assert pre_swap[2] == ("duplicate", 1)
    kmap = {(r.old, r.new) for r in spark.read.parquet(
        os.path.join(base, "store", "keeper_map")).collect()}
    assert kmap == {(1, 2)}

    # batch 3: a straddler near both reps (a copy of the shared core)
    spark.createDataFrame(
        [(9, t + " zz")], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    got.clear()
    run()
    # monotonicity: no pre-swap verdict was retro-edited (append-only
    # log never re-emits those ids), and the straddler still matches
    assert not got.keys() & pre_swap.keys()
    assert got[9] == ("duplicate", 2)
    # every admitted member resolves to the CURRENT rep in one lookup
    log = spark.createDataFrame(
        log_rows, "doc_id long, status string, dup_of long")
    res = {r.doc_id: r.dup_of
           for r in resolve_keepers(log, os.path.join(base, "store"))
           .where("status = 'duplicate'").collect()}
    assert res == {5: 2, 2: 2, 9: 2}
    shutil.rmtree(base, ignore_errors=True)
