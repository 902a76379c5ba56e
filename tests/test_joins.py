"""Tests for extended join operators (as-of, range)."""

from matcha_spark.operators.joins import asof_join, range_join


def _ts(s):
    return s


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, "k1", "2024-01-01 10:00:00"), (2, "k1", "2024-01-01 12:00:00"),
         (3, "k2", "2024-01-01 09:00:00")],
        "id long, key string, ts string",
    ).selectExpr("id", "key", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k1", "2024-01-01 09:30:00", 100.0), ("k1", "2024-01-01 11:30:00", 200.0),
         ("k2", "2024-01-01 10:00:00", 300.0)],
        "key string, rts string, px double",
    ).selectExpr("key", "cast(rts as timestamp) rts", "px")
    out = {
        r["id"]: r["px"]
        for r in asof_join(left, right, on="key", left_ts="ts", right_ts="rts").collect()
    }
    assert out[1] == 100.0  # latest k1 quote before 10:00
    assert out[2] == 200.0  # latest before 12:00
    assert out[3] is None  # k2 quote is after the event


def test_asof_equal_timestamp_visible(spark):
    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00")], "id long, key string, ts string"
    ).selectExpr("id", "key", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 5.0)], "key string, rts string, px double"
    ).selectExpr("key", "cast(rts as timestamp) rts", "px")
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts").collect()
    assert out[0]["px"] == 5.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00")], "id long, key string, ts string"
    ).selectExpr("id", "key", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 08:00:00", 5.0)], "key string, rts string, px double"
    ).selectExpr("key", "cast(rts as timestamp) rts", "px")
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", tolerance_s=3600
    ).collect()
    assert out[0]["px"] is None  # 2h gap > 1h tolerance


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:30:00"), (2, "u", "2024-01-01 13:00:00")],
        "id long, key string, at string",
    ).selectExpr("id", "key", "cast(at as timestamp) at")
    spans = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", "2024-01-01 11:00:00", "morning"),
         ("u", "2024-01-01 12:00:00", "2024-01-01 12:30:00", "noon")],
        "key string, s string, e string, label string",
    ).selectExpr("key", "cast(s as timestamp) s", "cast(e as timestamp) e", "label")
    out = range_join(points, spans, on="key", point="at", range_start="s", range_end="e")
    rows = {(r["id"], r["label"]) for r in out.collect()}
    assert rows == {(1, "morning")}  # 13:00 falls in no span


# -- skew utilities ----------------------------------------------------------


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F

    from matcha_spark.operators.skew import salted_agg

    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"total": "sum(v)", "n": "count(*)", "mx": "max(v)"},
            det_col="v",
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F

    from matcha_spark.operators.skew import salted_join

    left = spark.range(5000).select((F.col("id") % 5).alias("k"), F.col("id").alias("lv"))
    right = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 100).alias("rv"))
    got = salted_join(left, right, ["k"], det_col="lv").orderBy("lv").collect()
    want = left.join(right, "k").orderBy("lv").collect()
    assert [(r["k"], r["lv"], r["rv"]) for r in got] == [
        (r["k"], r["lv"], r["rv"]) for r in want
    ]


def test_salted_join_rejects_right_and_full(spark):
    import pytest
    from pyspark.sql import functions as F

    from matcha_spark.operators.skew import salted_join

    left = spark.range(10).select((F.col("id") % 2).alias("k"))
    right = spark.range(4).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(left, right, ["k"], how=how)
    # left outer still works: unmatched left rows appear exactly once
    got = salted_join(left, right, ["k"], n_salts=4, how="left")
    assert got.count() == 10


def test_transitive_closure_chain_and_cycle(spark):
    from matcha_spark.operators.graph import transitive_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)], "src long, dst long"
    )
    got = {(r["src"], r["dst"]) for r in transitive_closure(edges).collect()}
    want = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (10, 11), (11, 10), (10, 10), (11, 11)}
    assert got == want


def test_predicate_closure_over_triplesdb(spark):
    from matcha_spark import TriplesDB, kw
    from matcha_spark.operators.graph import predicate_closure
    from matcha_spark.terms import from_term

    db = TriplesDB.from_triples(
        spark,
        [(kw("a"), kw("knows"), kw("b")), (kw("b"), kw("knows"), kw("c")),
         (kw("a"), kw("likes"), kw("z"))],
    )
    got = {
        (from_term(r["s"]), from_term(r["o"]))
        for r in predicate_closure(db, kw("knows")).collect()
    }
    assert got == {(kw("a"), kw("b")), (kw("b"), kw("c")), (kw("a"), kw("c"))}
    db.unpersist()


def test_transitive_closure_explicit_checkpoint_dir(spark, tmp_path):
    """Cluster-portability contract: rounds materialize under the given
    shared dir (not an implicit driver tempdir), superseded round files
    are deleted, and results are unaffected."""
    import os

    from matcha_spark.operators.graph import transitive_closure

    ckpt = str(tmp_path / "shared_ckpt")
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    df = transitive_closure(edges, checkpoint_dir=ckpt)
    got = {(r["src"], r["dst"]) for r in df.collect()}
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    closure_dirs = [d for d in os.listdir(ckpt) if d.startswith("closure_")]
    assert len(closure_dirs) == 1
    # only the final accumulated result's files survive cleanup
    rounds = os.listdir(os.path.join(ckpt, closure_dirs[0]))
    assert len(rounds) == 1


def test_transitive_closure_uses_session_checkpoint_dir(spark, tmp_path):
    import os

    from matcha_spark.operators.graph import transitive_closure

    ckpt = str(tmp_path / "session_ckpt")
    os.makedirs(ckpt)
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        got = {(r["src"], r["dst"]) for r in transitive_closure(edges).collect()}
        assert got == {(1, 2), (2, 3), (1, 3)}
        # getCheckpointDir() returns a UUID subdir under ckpt
        found = [
            d for _, dirs, _ in os.walk(ckpt) for d in dirs if d.startswith("closure_")
        ]
        assert found
    finally:
        reset = getattr(spark._jsc.sc(), "checkpointDir_$eq")
        reset(spark._jvm.scala.Option.empty())


def test_resolve_work_dir_raises_on_cluster_without_shared_dir(spark, monkeypatch):
    import pytest

    from matcha_spark.operators import graph as graph_mod

    class FakeSC:
        master = "spark://cluster:7077"

        def getCheckpointDir(self):
            return None

    class FakeSession:
        sparkContext = FakeSC()

    with pytest.raises(ValueError, match="shared work directory"):
        graph_mod._resolve_work_dir(FakeSession(), None)


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", "2024-01-01 10:00:00"), (2, "k1", "2024-01-01 12:00:00"),
         (3, "k2", "2024-01-01 09:00:00"), (4, "k1", "2024-01-01 11:31:00")],
        "id long, key string, ts string",
    ).selectExpr("id", "key", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k1", "2024-01-01 09:30:00", 100.0), ("k1", "2024-01-01 11:30:00", 200.0),
         ("k1", "2024-01-01 13:00:00", 250.0), ("k2", "2024-01-01 10:00:00", 300.0)],
        "key string, rts string, px double",
    ).selectExpr("key", "cast(rts as timestamp) rts", "px")
    return left, right


def test_asof_forward(spark):
    left, right = _asof_frames(spark)
    out = {r["id"]: r["px"] for r in asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", direction="forward"
    ).collect()}
    assert out[1] == 200.0  # earliest k1 quote at/after 10:00
    assert out[2] == 250.0  # earliest at/after 12:00
    assert out[3] == 300.0  # k2 quote after the event IS visible forward
    assert out[4] == 250.0


def test_asof_nearest_and_tie(spark):
    left, right = _asof_frames(spark)
    out = {r["id"]: r["px"] for r in asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", direction="nearest"
    ).collect()}
    assert out[1] == 100.0  # 30min back vs 90min forward
    assert out[2] == 200.0  # 30min back vs 60min forward
    assert out[3] == 300.0  # only forward exists
    # id 4 at 11:31: backward 11:30 (60s) vs forward 13:00 -> backward
    assert out[4] == 200.0
    # exact tie: equidistant candidates break backward
    lt = spark.createDataFrame(
        [(9, "k", "2024-01-01 10:00:00")], "id long, key string, ts string"
    ).selectExpr("id", "key", "cast(ts as timestamp) ts")
    rt = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 1.0), ("k", "2024-01-01 11:00:00", 2.0)],
        "key string, rts string, px double",
    ).selectExpr("key", "cast(rts as timestamp) rts", "px")
    tied = asof_join(lt, rt, on="key", left_ts="ts", right_ts="rts",
                     direction="nearest").collect()
    assert tied[0]["px"] == 1.0


def test_asof_forward_nearest_tolerance(spark):
    left, right = _asof_frames(spark)
    fwd = {r["id"]: r["px"] for r in asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        direction="forward", tolerance_s=3600,
    ).collect()}
    assert fwd[2] == 250.0  # 13:00 is exactly 3600s after 12:00 — inclusive
    assert fwd[1] is None   # earliest forward (11:30) is 5400s away, outside
    near = {r["id"]: r["px"] for r in asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts",
        direction="nearest", tolerance_s=120,
    ).collect()}
    assert near[4] == 200.0  # 60s back inside tolerance
    assert near[1] is None   # both candidates outside 120s


def test_asof_directions_vs_bruteforce(spark):
    """Randomized differential: every direction against a brute-force
    per-row model."""
    import random

    rng = random.Random(11)
    base = 1_700_000_000
    lrows = [(i, f"k{rng.randrange(3)}", base + rng.randrange(0, 5000) * 2)
             for i in range(60)]
    rrows_raw = {(f"k{rng.randrange(3)}", base + rng.randrange(0, 5000) * 2 + 1)
                 for _ in range(40)}  # odd ts -> no exact L/R ties; unique (key, ts)
    rrows = [(k, t, float(i)) for i, (k, t) in enumerate(sorted(rrows_raw))]
    left = spark.createDataFrame(
        [(i, k, t) for i, k, t in lrows], "id long, key string, tsec long"
    ).selectExpr("id", "key", "cast(tsec as timestamp) ts")
    right = spark.createDataFrame(
        rrows, "key string, rsec long, px double"
    ).selectExpr("key", "cast(rsec as timestamp) rts", "px")

    def model(direction, tol=None):
        out = {}
        for i, k, t in lrows:
            cands = [(rt, px) for (rk, rt, px) in rrows if rk == k]
            b = max(((rt, px) for rt, px in cands if rt <= t and (tol is None or t - rt <= tol)),
                    default=None)
            f = min(((rt, px) for rt, px in cands if rt >= t and (tol is None or rt - t <= tol)),
                    default=None)
            if direction == "backward":
                out[i] = b and b[1]
            elif direction == "forward":
                out[i] = f and f[1]
            else:
                if b and f:
                    out[i] = b[1] if (t - b[0]) <= (f[0] - t) else f[1]
                else:
                    out[i] = (b or f) and (b or f)[1]
        return out

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 1000):
            got = {r["id"]: r["px"] for r in asof_join(
                left, right, on="key", left_ts="ts", right_ts="rts",
                direction=direction, tolerance_s=tol,
            ).collect()}
            assert got == model(direction, tol), (direction, tol)


def test_shortest_path_lengths_chain_diamond_cycle(spark):
    from matcha_spark.operators.graph import cleanup_closure, shortest_path_lengths

    edges = spark.createDataFrame(
        [
            # chain a->b->c->d  plus a shortcut a->c (diamond)
            ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
            # 2-cycle x<->y
            ("x", "y"), ("y", "x"),
        ],
        "src string, dst string",
    )
    out = shortest_path_lengths(edges)
    got = {(r.src, r.dst): r.dist for r in out.collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 1  # shortcut beats the 2-hop path
    assert got[("a", "d")] == 2  # via the shortcut
    assert got[("b", "d")] == 2
    assert got[("x", "y")] == 1 and got[("y", "x")] == 1
    assert got[("x", "x")] == 2 and got[("y", "y")] == 2  # cycle length
    assert ("d", "a") not in got  # no reverse reachability
    cleanup_closure(out)


def test_seeded_shortest_paths_matches_all_pairs(spark):
    """r09: seeded single-source distances == the all-pairs min-plus
    closure restricted to the seed row, on chain+diamond+cycle and
    weighted graphs; multi-seed takes the min over seeds; unreachable
    seeds yield nothing."""
    from matcha_spark.operators.graph import (
        cleanup_closure,
        seeded_shortest_paths,
        shortest_path_lengths,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
            ("x", "y"), ("y", "x"),
        ],
        "src string, dst string",
    )
    allp = shortest_path_lengths(edges)
    want = {r.dst: r.dist for r in allp.where("src = 'a'").collect()}
    seeds = spark.createDataFrame([("a",)], "n string")
    out = seeded_shortest_paths(edges, seeds)
    got = {r.n: r.dist for r in out.collect()}
    assert got == want == {"b": 1, "c": 1, "d": 2}
    cleanup_closure(out)

    # cycle seed reaches itself with the cycle length
    outx = seeded_shortest_paths(edges, spark.createDataFrame([("x",)], "n string"))
    assert {r.n: r.dist for r in outx.collect()} == {"y": 1, "x": 2}
    cleanup_closure(outx)

    # multi-seed: min over seeds ('a' reaches d in 2, 'c' in 1)
    outm = seeded_shortest_paths(
        edges, spark.createDataFrame([("a",), ("c",)], "n string")
    )
    assert {r.n: r.dist for r in outm.collect()} == {"b": 1, "c": 1, "d": 1}
    cleanup_closure(outm)

    # dead-end seed: empty result
    outd = seeded_shortest_paths(edges, spark.createDataFrame([("d",)], "n string"))
    assert outd.count() == 0
    cleanup_closure(allp)

    # weighted: label correction must REVISIT a node when a longer-hop
    # but cheaper route arrives later (a->c direct 5.0 vs a->b->c 2.0)
    wedges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0), ("c", "d", 0.5)],
        "src string, dst string, w double",
    )
    outw = seeded_shortest_paths(
        wedges, spark.createDataFrame([("a",)], "n string"), weight="w"
    )
    assert {r.n: r.dist for r in outw.collect()} == {"b": 1.0, "c": 2.0, "d": 2.5}
    cleanup_closure(outw)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        seeded_shortest_paths(
            spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, w double"),
            spark.createDataFrame([("a",)], "n string"),
            weight="w",
        )


def test_pagerank_matches_power_iteration(spark):
    """Differential vs a dense numpy power iteration with identical
    damping/iteration/dangling semantics."""
    import numpy as np

    from matcha_spark.operators.graph import pagerank

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 4 isolated? no, 3->2; 4 absent
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, damping=0.85, iters=12).collect()}

    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, d in edge_list:
        M[idx[d], idx[s]] += 1
    deg = M.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        mask = deg > 0
        contrib = M[:, mask] @ (r[mask] / deg[mask])
        dangling = r[~mask].sum()
        r = (1 - 0.85) / n + 0.85 * dangling / n + 0.85 * contrib
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # stochastic: ranks sum to 1
    # node 2 receives from three nodes -> highest rank
    assert max(got, key=got.get) == 2


def test_shortest_path_lengths_weighted(spark):
    import pytest as _pytest

    from matcha_spark.operators.graph import cleanup_closure, shortest_path_lengths

    edges = spark.createDataFrame(
        [
            ("a", "b", 1.0), ("b", "c", 1.0),   # a->b->c costs 2
            ("a", "c", 5.0),                      # direct edge is pricier
            ("a", "c", 4.0),                      # parallel edge, cheaper
            ("c", "d", 0.5),
        ],
        "src string, dst string, w double",
    )
    out = shortest_path_lengths(edges, weight="w")
    got = {(r.src, r.dst): r.dist for r in out.collect()}
    assert got[("a", "c")] == 2.0   # multi-hop beats both direct edges
    assert got[("a", "d")] == 2.5
    assert got[("b", "d")] == 1.5
    cleanup_closure(out)
    with _pytest.raises(ValueError):
        bad = spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, w double")
        shortest_path_lengths(bad, weight="w")


def test_pagerank_weighted_personalized(spark):
    """Weighted + personalized variants vs the numpy model."""
    import numpy as np

    from matcha_spark.operators.graph import pagerank

    edge_list = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 2, 5.0)]
    edges = spark.createDataFrame(edge_list, "src long, dst long, w double")
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.rank for r in pagerank(
        edges, weight="w", sources=srcs, damping=0.85, iters=15
    ).collect()}

    nodes = sorted({x for s, d, _ in edge_list for x in (s, d)})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edge_list:
        W[idx[d], idx[s]] += w
    strength = W.sum(axis=0)
    t = np.zeros(n)
    t[idx[0]] = 1.0
    r = t.copy()
    for _ in range(15):
        mask = strength > 0
        contrib = W[:, mask] @ (r[mask] / strength[mask])
        dangling = r[~mask].sum()
        r = (1 - 0.85) * t + 0.85 * dangling * t + 0.85 * contrib
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # personalization: mass concentrates near the source's neighborhood
    assert got[0] > got[3]  # node 3 only feeds in, unreachable from 0


def test_retired_entry_equivalences(spark):
    """r11 registry consolidation: the suite entries retired to free
    oracle-window capacity stay pinned to their still-oracle-backed
    siblings — the semantics they checked remain covered.

    - events_funnel_windowed(within=∞) ≡ events_funnel
    - events_sessionize ≡ events_sessionize_native on the session
      multiset (ids differ: ordinal vs start-time key)
    - token_count ≡ text_quality.n_tokens
    (events_salted_type_stats → salted_agg_matches_plain above;
    doc_dup_ngrams → dup_ngram_stats pytests + strip_dup_ngrams's
    oracle, which consumes the same dup-gram table.)"""
    from matcha_spark import relational as R
    from matcha_spark.operators.text import text_quality, token_count

    sf = "/root/testdata/sf0.001"
    plain = [tuple(r) for r in R.events_funnel(spark, sf).collect()]
    wide = [
        tuple(r)
        for r in R.events_funnel_windowed(spark, sf, within_s=10**9).collect()
    ]
    assert plain == wide and len(plain) == 3

    base = sorted(
        (r.user_id, r.n_events, round(r.session_value, 6))
        for r in R.events_sessionize(spark, sf).collect()
    )
    native = sorted(
        (r.user_id, r.n_events, round(r.session_value, 6))
        for r in R.events_sessionize_native(spark, sf).collect()
    )
    assert base == native and base

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    tc = {r.doc_id: r.n_tokens for r in token_count(docs).collect()}
    tq = {r.doc_id: r.n_tokens for r in text_quality(docs).collect()}
    assert tc == tq


def test_retired_entry_equivalences_r12(spark):
    """r12 registry consolidation (funding the ANN recall twins and the
    k-core maximality entry):

    - bgp_path_region_members ≡ bgp_path_inv_region_members — Inv of
      the same Seq path, same answer multiset by construction; the
      inverse variant keeps the oracle.
    - grouping_sets_priority ≡ the unioned plain group-bys it expands
      to (pure-Spark differential); the rollup/cube siblings stay
      oracle-backed on the same Expand code path.
    - emb_pq_exhaustive / emb_ivf_exhaustive — their oracle was the
      emb_cosine_topk alias; the exhaustive-config == exact pins live
      in test_operators.py::test_pq_recall_vs_bruteforce and
      ::test_ivf_recall_vs_bruteforce, and the families gained organic
      recall oracles (emb_{pq,ivf}_recall_sound).
    - doc_audio_features (fake-decoder audio plumbing) — subsumed by
      the real-decode pair doc_wav_features + doc_flac_features over
      the same audio_features kernel; the fake decoder stays pinned by
      test_operators.py::test_audio_features_and_resize.
    - doc_media_features (fake-decoder image plumbing) — subsumed by
      doc_png_features's real-codec drive of the same image_features
      kernel; fake path pinned by
      test_operators.py::test_multimodal_image_features.
    - doc_frame_sample (synthetic durations) — subsumed by
      doc_mp4_demux's real sample-table path through the same
      frame_sample op; pinned by test_operators.py::test_frame_sample."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"
    fwd = sorted(
        r.ename for r in suite.bgp_path_region_members(spark, sf).collect()
    )
    inv = sorted(
        r.ename for r in suite.bgp_path_inv_region_members(spark, sf).collect()
    )
    assert fwd == inv and fwd

    from matcha_spark import relational as R
    from matcha_spark.sources.tpch_graph import load_tables

    gs = {
        (r.o_orderpriority, r.o_orderstatus): (r.n, round(r.total, 2))
        for r in R.grouping_sets_priority(spark, sf).collect()
    }
    orders = load_tables(spark, sf, "orders")["orders"]
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    by_prio = {
        (r.o_orderpriority, None): (r.n, round(r.total, 2))
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), total.alias("total"))
        .collect()
    }
    by_status = {
        (None, r.o_orderstatus): (r.n, round(r.total, 2))
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), total.alias("total"))
        .collect()
    }
    grand = {
        (None, None): (r.n, round(r.total, 2))
        for r in orders.agg(
            F.count(F.lit(1)).alias("n"), total.alias("total")
        ).collect()
    }
    assert gs == {**by_prio, **by_status, **grand}


def test_retired_entry_equivalences_r13(spark):
    """r13 registry consolidation (funding doc_jsonl_ingest, the raw
    JSONL-ingestion entry):

    - doc_bpe_roundtrip — its oracle was only the whitespace
      normalization replay (lower + trim + collapse); the substantive
      claim, that BPE encode is lossless (concatenated pieces with
      </w> -> space reproduce the normalized text exactly), is pinned
      here as a pure-Spark differential against that normalization on
      the same sf0.001 documents.  The BPE family keeps oracle-backed
      coverage through doc_bpe_pack and doc_bpe_pretokens."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: r.rebuilt
        for r in suite.doc_bpe_roundtrip(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    want = {
        r.doc_id: r.norm
        for r in docs.select("doc_id", norm.alias("norm")).collect()
    }
    assert got == want and len(got) == 500


def test_retired_entry_equivalences_r14(spark):
    """r14 registry consolidation (funding doc_csv_ingest, the CSV
    corruption-replay ingestion entry):

    - doc_sample_hash — its oracle was only the md5-threshold filter
      over documents (keep iff md5(doc_id) < rate_threshold_hex(0.25)),
      replayed here as a pure-Spark differential with the hex constant
      inlined; the sample_hash kernel keeps oracle-backed coverage
      through orders_sample_consistent, which runs it keyed on TWO
      tables (o_orderkey / l_orderkey) and joins them — a strictly
      richer contract over the same operator.

    - emb_l2_norms (funding doc_warc_ingest, the WARC ingestion entry
      held back to r15) — its oracle was only sqrt(dot(v,v)), replayed
      here with an independent expression (posexplode + groupBy sum of
      squares); the same _norm kernel stays oracle-backed inside the
      cosine denominators of emb_cosine_topk / emb_dup_pairs /
      dedup_near_emb.

    - doc_minhash_planted (funding doc_dup_spans_planted, the
      repeated-span dedup family's oracle twin, held back to r15) —
      its oracle asserted that every >= 3-token document pairs with
      its planted identical copy among the LSH candidates.  Replayed
      exactly below, then shown to be IMPLIED by the still-backed
      dedup_near_lsh_planted keep-map: the set of copies the keep-map
      dedups away (keep_doc_id != self) is the SAME >= 3-token set,
      and a copy can only be deduped if the banding first surfaced a
      candidate pair linking it to its group.

    - doc_cdc_tiling (funding dedup_keep_best_docs, the quality-ranked
      survivor entry, held back to r15) — its oracle was only
      strlen(text) + a constant TRUE (chunks tile the document).
      Replayed below as a pure-Spark differential: every doc tiled,
      n_bytes == octet_length(text).  The cdc_chunks offsets stay
      oracle-backed through doc_dup_spans_planted, whose tail-window
      coverage floor is computed FROM those offsets — broken tiling
      breaks that floor."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id for r in suite.doc_sample_hash(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # 0.25 is binary-exact: the threshold is literally 0x4 << 124
    want = {
        r.doc_id
        for r in docs.where(
            F.md5(F.col("doc_id").cast("string"))
            < F.lit("4" + "0" * 31)
        ).collect()
    }
    assert got == want and 0 < len(got) < 500

    norms = {
        r.vec_id: r.l2_norm
        for r in suite.emb_l2_norms(spark, sf).collect()
    }
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    want_n = {
        r.vec_id: r.n
        for r in emb.select("vec_id", F.posexplode("embedding"))
        .groupBy("vec_id")
        .agg(F.round(F.sqrt(F.sum(F.col("col") * F.col("col"))), 4).alias("n"))
        .collect()
    }
    assert norms == want_n and len(norms) > 0

    pairs = {
        (r.doc_a, r.doc_b)
        for r in suite.doc_minhash_planted(spark, sf).collect()
    }
    eligible = {
        r.doc_id
        for r in docs.where(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3
        ).collect()
    }
    assert pairs == {(a, a + 100000) for a in eligible} and len(pairs) > 0
    # subsumption: the still-backed keep-map dedups exactly those copies
    deduped = {
        r.doc_id - 100000
        for r in suite.dedup_near_lsh_planted(spark, sf).collect()
        if r.keep_doc_id != r.doc_id
    }
    assert deduped == eligible

    tiling = suite.doc_cdc_tiling(spark, sf).collect()
    lens = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.octet_length("text").alias("n")
        ).collect()
    }
    assert len(tiling) > 0
    for r in tiling:
        assert r.tiled and r.n_bytes == lens[r.doc_id], r


def test_retired_entry_equivalences_r15(spark):
    """r15 registry consolidation (funding the three NEW oracle
    entries doc_winnow_planted / emb_ivfpq_recall_sound /
    doc_temperature_mixture) — each retired invariant is COMPUTED
    against the still-backed sibling that subsumes it:

    - doc_fingerprint (funding doc_winnow_planted): its oracle was the
      per-doc md5(normalized text) value.  dedup_exact_docs still
      EXPOSES those fp values per group over the same normalization
      chain — dedup_exact(docs) is byte-identical to
      fingerprint(docs).groupBy(fp).agg(min, count), computed below;
      a per-doc fp bug either forges a new fp value (breaks the fp
      column) or moves a doc across groups (breaks keep/count).

    - emb_lsh_planted (funding emb_ivfpq_recall_sound): an identical
      planted copy collides with its original in every sign bucket
      (the SAME similarity.sign_buckets kernel the still-backed
      emb_dup_pairs_lsh_planted pins under the oracle), and the
      bucketed top-k ranking path stays backed through
      emb_lsh_recall_sound.  The full planted invariant — top-1 for
      every probe is its copy at cosine 1.0 — is replayed below.

    - doc_unigram_logloss (funding doc_temperature_mixture): with the
      BOS sentinel prepended, every real token is exactly one bigram
      position's predicted word, so the bigram op's unigram term
      c(w)/T is the same corpus unigram model over the same
      tokenization and unigram_logloss(docs) ==
      bigram_logloss(docs, alpha=0) row for row; the unigram rates
      stay under the oracle inside doc_bigram_logloss (alpha=0.4),
      where they enter every interpolated probability."""
    from pyspark.sql import functions as F

    from matcha_spark import suite
    from matcha_spark.operators import similarity as S
    from matcha_spark.operators import text as T

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # doc_fingerprint ≡ the group key dedup_exact_docs exposes
    fp = suite.doc_fingerprint(spark, sf)
    derived = {
        (r.fp, r.keep_doc_id, r.n_copies)
        for r in fp.groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .collect()
    }
    exact = {
        (r.fp, r.keep_doc_id, r.n_copies)
        for r in suite.dedup_exact_docs(spark, sf).collect()
    }
    assert derived == exact and 0 < len(exact) <= fp.count()

    # emb_lsh_planted replay: top-1 per probe is its copy at cosine 1.0
    got = {
        (r.q_id, r.n_id, r.cosine, r.rank)
        for r in suite.emb_lsh_planted(spark, sf).collect()
    }
    n_probes = spark.read.parquet(f"{sf}/embeddings.parquet").where(
        "vec_id < 25"
    ).count()
    assert got == {(q, q + 100000, 1.0, 1) for q in range(n_probes)}
    # and the bucket-collision half rides the shared kernel: identical
    # vectors share every (table, bucket) row sign_buckets emits
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").where("vec_id < 5")
    b = S.sign_buckets(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        "vec",
    ).select("id", "table", "bucket").collect()
    per_id = {}
    for r in b:
        per_id.setdefault(r.id, set()).add((r.table, r.bucket))
    b2 = S.sign_buckets(
        emb.select((F.col("vec_id") + 100000).alias("id"),
                   F.col("embedding").alias("vec")),
        "vec",
    ).select("id", "table", "bucket").collect()
    for r in b2:
        assert (r.table, r.bucket) in per_id[r.id - 100000]

    # doc_unigram_logloss ≡ bigram_logloss(alpha=0)
    uni = {
        (r.doc_id, r.n_tokens, r.logloss)
        for r in suite.doc_unigram_logloss(spark, sf).collect()
    }
    bi0 = {
        (r.doc_id, r.n_tokens, r.logloss)
        for r in T.bigram_logloss(docs, alpha=0.0).collect()
    }
    assert uni == bi0 and len(uni) == docs.count()


def test_iterative_oracle_equivalence():
    """r17 (verdict ask #2): the Python-driven iterative min-label
    DuckDB oracle (tools/iter_oracles.py) computes EXACTLY the same
    (vec_id, keep_vec_id) truth as the driver-facing recursive-CTE
    oracle — pinned on the shipped sf0.01 corpus (organic near-dup
    structure) and on a 40-node path graph (diameter 39, the shape
    where plain neighbor-min propagation needs 39 rounds and the
    pointer-jumping step earns its keep), where both are also checked
    against a pure-Python union-find.  No Spark involved: both arms
    are independent DuckDB truths."""
    import math
    import os
    import sys

    import duckdb

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from iter_oracles import dedup_near_emb as iter_oracle

    from matcha_spark.suite import ORACLES

    def run_both(con):
        it = sorted(iter_oracle(con).fetchall())
        rec = sorted(con.execute(ORACLES["dedup_near_emb"]).fetchall())
        return it, rec

    # shipped corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet'"
    )
    it, rec = run_both(con)
    assert it == rec and len(it) > 0
    con.close()

    # 40-node path: v_i = (e_i + e_{i+1})/sqrt(2) -> consecutive cosine
    # 0.5 (edge at the 0.4 threshold), gap-2 cosine 0 (no edge); one
    # component whose min label must reach the far end
    n, dim = 40, 41
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[i] = v[i + 1] = 1.0 / math.sqrt(2.0)
        rows.append((i + 100, v))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    it, rec = run_both(con)
    assert it == rec
    # union-find ground truth: a single chain, everyone keeps node 100
    assert it == [(i + 100, 100) for i in range(n)]
    con.close()


def test_retired_entry_equivalences_r18(spark):
    """r18 registry consolidation (funding the two promoted oracles
    doc_contamination_bloom / doc_lang_classifier) — each retired
    invariant is COMPUTED against the still-backed sibling that
    subsumes it:

    - doc_quality_filter (funding doc_contamination_bloom's slot):
      quality_filter with no compression band is EXACTLY
      text_quality filtered by the four threshold predicates — same
      rows, same columns, same values (the signal values stay
      hash-backed through doc_text_quality, and the gate also runs
      inside doc_pipeline_curate's oracle-backed cascade).

    - doc_contamination (funding doc_lang_classifier's slot): the
      promoted doc_contamination_bloom hash-checks the exact side's
      per-doc (n_grams, contaminated_grams) under the same oracle
      CTEs; the only dropped column, the 6dp contamination ratio, is
      the row-local derivation round(cg / ng, 6) — replayed below
      from the subsuming entry's own columns."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"

    # doc_quality_filter ≡ doc_text_quality + threshold predicates
    gate = {
        tuple(r) for r in suite.doc_quality_filter(spark, sf).collect()
    }
    derived = {
        tuple(r)
        for r in suite.doc_text_quality(spark, sf)
        .where(
            (F.col("n_tokens") >= 40)
            & (F.col("avg_token_len") <= 12.0)
            & (F.col("punct_ratio") <= 0.1)
            & (F.col("stopword_ratio") >= 0.01)
        )
        .collect()
    }
    assert gate == derived and 0 < len(gate)

    # doc_contamination ≡ doc_contamination_bloom's exact columns +
    # the row-local ratio derivation
    full = {
        (r.doc_id, r.n_grams, r.contaminated_grams, r.contamination)
        for r in suite.doc_contamination(spark, sf).collect()
    }
    replayed = {
        (
            r.doc_id,
            r.n_grams,
            r.contaminated_grams,
            r.contamination,
        )
        for r in suite.doc_contamination_bloom(spark, sf)
        .withColumn(
            "contamination",
            F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
                F.round(
                    F.col("contaminated_grams") / F.col("n_grams"), 6
                )
            ),
        )
        .select("doc_id", "n_grams", "contaminated_grams", "contamination")
        .collect()
    }
    assert full == replayed and any(c > 0 for *_, c in full)


def test_driver_tail_matches_distributed_loops(spark):
    """r18 driver tails: each closure/path loop's small-graph driver
    arm must equal the distributed arm (small_cutoff=0) row-for-row —
    the tail is an execution strategy, never a semantics change.
    Graphs cover cycles (reflexive pairs), diamonds (min over paths),
    parallel weighted edges, and unreachable components."""
    from matcha_spark.operators.graph import (
        cleanup_closure,
        seeded_reachability,
        seeded_shortest_paths,
        shortest_path_lengths,
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
         ("x", "y"), ("y", "x"), ("z", "z")],
        "src string, dst string",
    )
    wedges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0),
         ("a", "c", 4.0), ("c", "d", 0.5), ("x", "y", 2.0), ("y", "x", 3.0)],
        "src string, dst string, w double",
    )
    seeds = spark.createDataFrame([("a",), ("x",)], "n string")

    for mk in (
        lambda co: transitive_closure(edges, small_cutoff=co),
        lambda co: shortest_path_lengths(edges, small_cutoff=co),
        lambda co: shortest_path_lengths(wedges, weight="w", small_cutoff=co),
        lambda co: seeded_reachability(edges, seeds, small_cutoff=co),
        lambda co: seeded_reachability(
            edges, seeds, keep_root=True, small_cutoff=co
        ),
        lambda co: seeded_reachability(
            edges, seeds, materialize_edges=False, small_cutoff=co
        ),
        lambda co: seeded_shortest_paths(edges, seeds, small_cutoff=co),
        lambda co: seeded_shortest_paths(
            wedges, seeds, weight="w", small_cutoff=co
        ),
        lambda co: seeded_shortest_paths(
            edges, seeds, materialize_edges=False, small_cutoff=co
        ),
    ):
        driver_df = mk(10_000)
        dist_df = mk(0)
        got = sorted(map(tuple, driver_df.collect()))
        want = sorted(map(tuple, dist_df.collect()))
        assert got == want, (got, want)
        cleanup_closure(driver_df)
        cleanup_closure(dist_df)
