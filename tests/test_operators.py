"""Tests for pipeline operators: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from matcha_spark.operators import dedup as D
from matcha_spark.operators import multimodal as M
from matcha_spark.operators import similarity as S
from matcha_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # plant exact and near duplicates with known ids
    src = base.limit(3).collect()
    extra = [
        (9001, src[0]["text"], "en", "dup", len(src[0]["text"])),  # exact dup of doc 0
        (9002, src[1]["text"] + " extra token", "en", "dup", 0),  # near dup of doc 1
        (9003, "completely unrelated tiny text", "en", "dup", 0),
    ]
    extra_df = spark.createDataFrame(extra, base.schema)
    return base.unionByName(extra_df).cache()


def test_dedup_exact_finds_planted_dup(docs):
    res = T.dedup_exact(docs)
    groups = {r["keep_doc_id"]: r["n_copies"] for r in res.collect()}
    first_id = docs.orderBy("doc_id").first()["doc_id"]
    assert groups[first_id] == 2  # original + planted 9001
    assert sum(groups.values()) == docs.count()


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_candidates(docs).collect()
    }
    ids = sorted(r["doc_id"] for r in docs.limit(2).collect())
    # exact dup pair must be a candidate; near-dup pair should be too
    d0 = docs.orderBy("doc_id").first()["doc_id"]
    d1 = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()][1]
    assert (d0, 9001) in pairs
    assert (d1, 9002) in pairs


def test_ngram_jaccard_scores(docs):
    res = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    d0 = docs.orderBy("doc_id").first()["doc_id"]
    assert res[(d0, 9001)] == 1.0  # exact dup → jaccard 1


def test_simhash_close_for_near_dups(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    d0 = docs.orderBy("doc_id").first()["doc_id"]
    d1 = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()][1]
    assert sigs[d0] == sigs[9001]  # identical text → identical signature

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(sigs[d1], sigs[9002]) <= 8  # near dup → close
    assert hamming(sigs[d0], sigs[9003]) > 8  # unrelated → far


def test_text_quality_and_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World! This is a test."), (2, "one two three")],
        "doc_id long, text string",
    )
    tq = {r["doc_id"]: r for r in T.text_quality(docs).collect()}
    assert tq[1]["n_tokens"] == 6
    assert tq[2]["punct_ratio"] == 0.0
    tc = {r["doc_id"]: r for r in T.token_count(docs).collect()}
    assert tc[2]["n_tokens"] == 3


def test_lang_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "el gato es un animal que vive en la casa"),
            (3, "le chat est un animal que nous aimons dans ce pays"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    res = {r["doc_id"]: r["lang_pred"] for r in T.lang_id(docs).collect()}
    assert res[1] == "en"
    assert res[2] == "es"
    assert res[3] == "fr"
    assert res[4] == "und"


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    res = S.cosine_topk(emb, emb.where("vec_id = 0"), k=3).collect()
    order = [r["n_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]


def test_ann_string_vec_ids(spark):
    """Every ANN family is id-type-agnostic: exact top-k, range search,
    LSH, IVF, and PQ all adopt a string vec_id type end-to-end (kernel
    schemas, query frames, self-exclusion, rank tiebreaks)."""
    emb = spark.createDataFrame(
        [
            ("v-0", [1.0, 0.0, 0.0, 0.0]),
            ("v-1", [0.9, 0.1, 0.0, 0.0]),
            ("v-2", [0.0, 1.0, 0.0, 0.0]),
            ("v-3", [-1.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id string, embedding array<float>",
    )
    q = emb.where("vec_id = 'v-0'")
    res = S.cosine_topk(emb, q, k=3)
    assert res.schema["n_id"].dataType.simpleString() == "string"
    order = [r["n_id"] for r in sorted(res.collect(), key=lambda r: r["rank"])]
    assert order == ["v-1", "v-2", "v-3"]
    rng = {r.n_id for r in S.cosine_range_search(emb, q, threshold=0.5).collect()}
    assert rng == {"v-1"}
    # the approximate families parameterized to exhaustiveness must
    # agree with the exact order (the emb_*_exhaustive twin invariant)
    ivf = S.ivf_topk(emb, q, k=3, n_centroids=1, n_probe=1)
    assert [r.n_id for r in sorted(ivf.collect(), key=lambda r: r.rank)] == order
    pq = S.pq_topk(emb, q, k=3, m=4, nbits=2, refine=4)
    assert [r.n_id for r in sorted(pq.collect(), key=lambda r: r.rank)] == order
    ivfpq = S.ivfpq_topk(
        emb, q, k=3, n_centroids=1, n_probe=1, m=4, nbits=2, refine=4
    )
    assert [r.n_id for r in sorted(ivfpq.collect(), key=lambda r: r.rank)] == order
    lsh = S.lsh_bucketed_topk(emb, q, k=3, dim=4, n_planes=1, n_tables=4)
    assert {r.n_id for r in lsh.collect()} <= {"v-1", "v-2", "v-3"}
    assert "v-1" in {r.n_id for r in lsh.where("rank = 1").collect()}


def test_ann_query_side_guard(spark, monkeypatch):
    """r10 (verdict ask #7): the exact/IVF/PQ operators collect the
    query side to the driver by contract — a corpus-sized query set
    must raise with a pointer at the distributed alternative, not OOM
    the driver silently."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(S, "MAX_QUERY_ROWS", 3)
    for fn in (
        lambda: S.cosine_topk(emb, emb, k=2),
        lambda: S.cosine_range_search(emb, emb, threshold=0.5),
        lambda: S.ivf_topk(emb, emb, k=2, n_centroids=2),
        lambda: S.pq_topk(emb, emb, k=2, m=2, nbits=2),
        lambda: S.ivfpq_topk(emb, emb, k=2, n_centroids=2, m=2, nbits=2),
    ):
        with pytest.raises(ValueError, match="lsh_bucketed_topk"):
            fn()
    # at or below the cap: unchanged behavior
    assert S.cosine_topk(emb, emb.where("vec_id < 3"), k=1).count() == 3


def test_ann_empty_corpus_guard(spark):
    """r15 advice fix: an empty corpus raises a clear trained-on-nothing
    error from the sample draw (previously pq/ivfpq died with
    ZeroDivisionError in the codebook padding)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    ).where("vec_id < 0")
    q = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    for fn, name in (
        (lambda: S.pq_topk(emb, q, k=1, m=2, nbits=2), "pq_topk"),
        (lambda: S.ivfpq_topk(emb, q, k=1, n_centroids=2, m=2, nbits=2),
         "ivfpq_topk"),
        (lambda: S.train_kmeans_centroids(emb, 2), "train_kmeans_centroids"),
    ):
        with pytest.raises(ValueError, match=f"{name}: empty corpus"):
            fn()


def test_cosine_range_search_exact(spark):
    """Radius search returns exactly the pairs at or above the floor —
    no self-pairs — and agrees with a threshold filter over the brute
    top-k scores."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    res = {
        (r["q_id"], r["n_id"])
        for r in S.cosine_range_search(
            emb, emb.where("vec_id = 0"), threshold=0.5
        ).collect()
    }
    assert res == {(0, 1)}  # cos(0,1)≈0.994; 2 is 0.0; 3 is -1
    # consistency with the exhaustive scorer at a loose threshold
    loose = {
        (r["q_id"], r["n_id"])
        for r in S.cosine_range_search(
            emb, emb.where("vec_id < 2"), threshold=-1.0
        ).collect()
    }
    allpairs = {
        (r["q_id"], r["n_id"])
        for r in S.cosine_topk(emb, emb.where("vec_id < 2"), k=10).collect()
    }
    assert loose == allpairs


def test_cosine_range_search_zero_query(spark):
    """Regression (r09 advice): a zero-norm QUERY vector must not
    poison the batch with NaN similarities — it simply matches nothing,
    while other queries in the same call keep their matches (same guard
    cosine_topk applies corpus-side)."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (9, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    res = {
        (r["q_id"], r["n_id"])
        for r in S.cosine_range_search(emb, qs, threshold=0.5).collect()
    }
    assert res == {(0, 1)}  # zero query contributes nothing, no NaNs


def test_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    exact = {
        (r["q_id"], r["n_id"]) for r in S.cosine_topk(emb, q, k=5).collect()
    }
    single = {
        (r["q_id"], r["n_id"])
        for r in S.lsh_bucketed_topk(
            emb, q, k=5, n_planes=4, n_tables=8, multi_probe=False
        ).collect()
    }
    multi = {
        (r["q_id"], r["n_id"])
        for r in S.lsh_bucketed_topk(emb, q, k=5, n_planes=4, n_tables=8).collect()
    }
    single_recall = len(exact & single) / len(exact)
    multi_recall = len(exact & multi) / len(exact)
    assert single_recall >= 0.2  # approximate by design
    # tables × Hamming-1 probing must reach near-exact at this config
    assert multi_recall >= 0.9, (single_recall, multi_recall)
    assert multi_recall >= single_recall


def test_lsh_broadcast_gated_on_query_size(spark, monkeypatch):
    """r12 (verdict ask #1): lsh_bucketed_topk is the documented
    corpus-scale alternative to the driver-collecting ANN operators, so
    its query-side broadcast hint must be gated on query size — a small
    probe set broadcasts, a query side whose post-explode row count
    exceeds MAX_BROADCAST_PROBE_ROWS joins distributed (shuffle join,
    no forced unbounded broadcast)."""
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3), 0.5]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    small_q = emb.where("vec_id < 3")
    plan_small = (
        S.lsh_bucketed_topk(emb, small_q, k=2, dim=4, n_planes=2, n_tables=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan_small or "BroadcastHashJoin" in plan_small
    # corpus-sized query side (simulated by shrinking the cap): the
    # bucket join must be planned WITHOUT a broadcast hint
    monkeypatch.setattr(S, "MAX_BROADCAST_PROBE_ROWS", 1)
    big = S.lsh_bucketed_topk(emb, emb, k=2, dim=4, n_planes=2, n_tables=2)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan_big, plan_big
    assert "BroadcastHashJoin" not in plan_big, plan_big
    # and it still computes the same neighbors as the hinted path
    monkeypatch.setattr(S, "MAX_BROADCAST_PROBE_ROWS", 262_144)
    hinted = S.lsh_bucketed_topk(emb, emb, k=2, dim=4, n_planes=2, n_tables=2)
    assert {tuple(r) for r in big.collect()} == {tuple(r) for r in hinted.collect()}


def test_multimodal_image_features(spark):
    rows = [
        (1, "image", "jpeg", 8, 8, None, bytearray(b"\x01\x02\x03")),
        (2, "image", "png", 8, 8, None, bytearray(b"\x04\x05")),
        (3, "video", "mp4", None, None, 3500, bytearray(b"\x00")),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in M.image_features(media).collect()}
    assert set(feats) == {1, 2}
    assert len(feats[1]["feature"]) == 8
    assert feats[1]["n_bytes"] == 3
    # deterministic fake decoder → reproducible features
    feats2 = {r["media_id"]: r for r in M.image_features(media).collect()}
    assert feats[1]["feature"] == feats2[1]["feature"]


def test_multimodal_strict_decoder_raises():
    with pytest.raises(NotImplementedError):
        M.strict_decode_image(b"anything")


def test_frame_sample(spark):
    rows = [(3, "video", "mp4", None, None, 3500, bytearray(b"\x00"))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    frames = M.frame_sample(media, every_ms=1000).collect()
    assert [f["frame_ts_ms"] for f in frames] == [0, 1000, 2000, 3000]
    assert [f["frame_idx"] for f in frames] == [0, 1, 2, 3]


def test_simhash_candidates_complete_vs_bruteforce(docs):
    """Pigeonhole guarantee: every pair within Hamming<=3 must appear in
    the banded candidate output (recall 1.0), with correct distances."""
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    want = {
        (a, b): hamming(sigs[a], sigs[b])
        for a in sigs
        for b in sigs
        if a < b and hamming(sigs[a], sigs[b]) <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_candidates(docs, max_hamming=3).collect()
    }
    assert want, "fixture must contain at least one hamming<=3 pair"
    assert got == want


def test_simhash_candidates_null_docs_excluded(spark):
    """NULL/empty-text docs (signature 0) must not enter the banded
    self-join: every NULL-NULL pair is hamming 0 across all bands, so a
    NULL-heavy corpus would otherwise blow up quadratically.  simhash()
    itself stays row-preserving (one signature row per doc)."""
    rows = [(i, None) for i in range(20)] + [
        (100, "alpha beta gamma delta"),
        (101, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.simhash(docs).count() == 22  # row-preserving map
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_candidates(docs, max_hamming=3).collect()
    }
    assert pairs == {(100, 101)}


def test_connected_components(spark):
    # two components: {1,2,3,4} chained, {10,11}; 99 isolated via self-ref edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    comp = {r["id"]: r["component"] for r in D.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # a self-loop-only node is MENTIONED and must keep its row
    # (r10 review finding: the contraction rewrite briefly dropped it)
    edges2 = spark.createDataFrame(
        [(1, 2), (99, 99)], "doc_a long, doc_b long"
    )
    comp2 = {
        r["id"]: r["component"] for r in D.connected_components(edges2).collect()
    }
    assert comp2 == {1: 1, 2: 1, 99: 99}


def test_connected_components_unconverged_raises(spark):
    """r10 advice: with small_cutoff=0, a chain longer than max_iter
    can contract must RAISE, never return a silently-partial labeling
    (wrong components would corrupt incremental-dedup admissions)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(chain, max_iter=1, small_cutoff=0)
    # the same graph converges fine when the driver finish is allowed
    comp = {
        r["id"]: r["component"]
        for r in D.connected_components(chain, max_iter=1).collect()
    }
    assert set(comp.values()) == {0}


def _py_components(edges):
    """Reference union-find over an edge list (min id = root)."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", range(8))
def test_connected_components_differential(spark, seed):
    """r10 contraction rewrite: random graphs — dense blobs, long
    chains (the contraction-unfriendly shape), duplicate and reversed
    edges, self-loops — vs a Python union-find.  Runs both the
    distributed rounds and the driver-finish path (small_cutoff=0
    forces every round distributed)."""
    import random as _r

    rng = _r.Random(4400 + seed)
    n = rng.randint(2, 40)
    edges = []
    if rng.random() < 0.4:  # long chain segment
        base = rng.randint(0, 1000)
        edges += [(base + i, base + i + 1) for i in range(rng.randint(5, 25))]
    edges += [
        (rng.randint(0, n), rng.randint(0, n))
        for _ in range(rng.randint(1, 60))
    ]
    if rng.random() < 0.5:  # duplicates + reversals
        edges += [(b, a) for a, b in rng.sample(edges, min(5, len(edges)))]
    # self-loops included: a self-loop-only node keeps a self-mapping
    # row in both the engine and the union-find
    want = _py_components(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    cutoff = 0 if seed % 2 else 200_000
    got = {
        r["id"]: r["component"]
        for r in D.connected_components(df, small_cutoff=cutoff).collect()
    }
    assert got == want, f"seed={seed} cutoff={cutoff}\nedges={edges}"


@pytest.mark.parametrize("seed", range(4))
def test_incremental_simhash_decisions_differential(spark, seed):
    """r10 admission restructure (contraction-before-distinct): the
    engine's two-batch decisions must equal a brute-force Python model
    computed over the ENGINE's own signatures — store-vs-store pairs
    pruned, zero signatures excluded, transitive clusters, corpus-wins
    min-keeper."""
    import random as _r

    rng = _r.Random(5200 + seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

    def mk(i):
        if rng.random() < 0.1:
            return (i, None)
        base = [rng.choice(words) for _ in range(rng.randint(3, 8))]
        return (i, " ".join(base))

    rows = [mk(i) for i in range(rng.randint(8, 24))]
    cut = rng.randint(2, len(rows) - 2)
    mh = rng.choice([3, 8, 16])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    first = docs.where(F.col("doc_id") < cut)
    batch = docs.where(F.col("doc_id") >= cut)
    # alternate the r18 driver tail and the distributed contraction so
    # the model pins BOTH arms (cf. the connected_components test above)
    cutoff = 0 if seed % 2 else 200_000
    dec1, sigs = D.incremental_dedup_simhash(
        first, None, max_hamming=mh, small_cutoff=cutoff
    )
    dec2, _ = D.incremental_dedup_simhash(
        batch, sigs, max_hamming=mh, small_cutoff=cutoff
    )

    store = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    bsig = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash(batch).select("doc_id", "simhash").collect()
    }
    # model: pairs among store ∪ batch with ≥1 batch side, nonzero sigs
    sides = {**store, **bsig}
    edges = []
    ids = sorted(sides)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if a in store and b in store:
                continue
            if sides[a] == 0 or sides[b] == 0:
                continue
            if bin((sides[a] ^ sides[b]) & ((1 << 64) - 1)).count("1") <= mh:
                edges.append((a, b))
    comp = _py_components(edges)
    want = {}
    for d in bsig:
        members = [m for m, c in comp.items() if c == comp.get(d, d)] or [d]
        acc = [m for m in members if m in store]
        keeper = min(acc) if acc else min(m for m in members if m in bsig)
        want[d] = (keeper == d, None if keeper == d else keeper)
    got = {r["doc_id"]: (r["keep"], r["dup_of"]) for r in dec2.collect()}
    assert got == want, f"seed={seed} mh={mh}\nrows={rows}\ncut={cut}"


def test_dedup_near_docs_keep_mapping(docs):
    res = {r["doc_id"]: r["keep_doc_id"] for r in D.dedup_near_docs(docs, threshold=0.5).collect()}
    d0 = docs.orderBy("doc_id").first()["doc_id"]
    d1 = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()][1]
    assert len(res) == docs.count()  # one row per doc
    assert res[9001] == d0  # exact dup keeps the original
    assert res[d0] == d0
    assert res[9002] == d1  # near dup keeps its original
    assert res[9003] == 9003  # unrelated doc keeps itself


def test_dedup_near_docs_lsh_keep_mapping(docs):
    res = {
        r["doc_id"]: r["keep_doc_id"]
        for r in D.dedup_near_docs_lsh(docs, threshold=0.5).collect()
    }
    d0 = docs.orderBy("doc_id").first()["doc_id"]
    assert len(res) == docs.count()
    assert res[9001] == d0  # exact dup caught by every band
    assert res[9003] == 9003


def test_dedup_keep_best_mapping(spark):
    """r14 keep-best survivor selection: within a near-dup cluster the
    HIGHEST-scoring member survives (default score = char length →
    keep the most complete copy), ties break toward the smaller id,
    singletons keep themselves — and on uniform scores the mapping
    degrades to exactly the keep-first contract of dedup_near_docs."""
    from matcha_spark.operators.dedup import (
        dedup_near_docs,
        dedup_near_docs_keep_best,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),                                   # cluster, short
        (2, base + " iota kappa and a longer tail"),  # cluster, LONGEST
        (3, base + " iota"),                          # cluster, middle
        (4, "totally unrelated words only here"),     # singleton
        (5, "pair one same text"),                    # tie pair...
        (6, "pair one same text"),                    # ...equal length
    ]
    docs = _span_docs(spark, rows)
    got = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs_keep_best(docs, threshold=0.3).collect()
    }
    assert len(got) == 6
    assert got[1] == got[2] == got[3] == 2  # best, not first
    assert got[4] == 4
    assert got[5] == got[6] == 5  # tie -> min id
    # uniform score degrades to keep-first
    from pyspark.sql import functions as F

    uniform = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs_keep_best(
            docs, threshold=0.3, score=F.lit(1)
        ).collect()
    }
    first = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs(docs, threshold=0.3).collect()
    }
    assert uniform == first
    # NULL scores: struct-max orders NULL smallest — a NULL-scored
    # member loses to any scored one, and an all-NULL cluster degrades
    # to keep-first (docstring contract of keep_best_map)
    null_mid = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs_keep_best(
            docs,
            threshold=0.3,
            score=F.when(F.col("doc_id") != 3, F.length("text")),
        ).collect()
    }
    assert null_mid[1] == null_mid[2] == null_mid[3] == 2
    all_null = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs_keep_best(
            docs, threshold=0.3, score=F.lit(None).cast("int")
        ).collect()
    }
    assert all_null == first


def test_keep_best_rejects_string_ids(spark):
    """The negated-id tiebreak needs numeric ids; string ids (accepted
    elsewhere in the dedup family) must fail loudly, not mis-sort."""
    import pytest as _p

    from matcha_spark.operators.dedup import keep_best_map

    docs = spark.createDataFrame(
        [("a", 1), ("b", 2)], "doc_id string, s int"
    )
    comp = spark.createDataFrame([("a", "a"), ("b", "a")], "id string, component string")
    with _p.raises(TypeError, match="numeric"):
        keep_best_map(docs, comp, "s")


def test_dedup_lsh_keep_best_mapping(spark):
    """The scale path's score= hook: identical clusters to the plain
    LSH keep-map, best-scoring survivor kept (char length default is
    the caller's choice here — passed explicitly as octet_length to
    show an arbitrary quality column plugs in)."""
    from pyspark.sql import functions as F

    from matcha_spark.operators.dedup import dedup_near_docs_lsh

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _span_docs(
        spark,
        [
            (1, base),
            (2, base + " iota kappa and a much longer tail here"),
            (3, "nothing shared with the others at all"),
        ],
    )
    got = {
        r.doc_id: r.keep_doc_id
        for r in dedup_near_docs_lsh(
            docs, threshold=0.3, score=F.octet_length("text")
        ).collect()
    }
    assert got[1] == got[2] == 2 and got[3] == 3


def test_winnow_guarantee_and_contracts(spark):
    """r14 winnowing fingerprints: (a) the Schleimer et al. guarantee
    — two documents sharing a substring of >= window+k-1 characters
    share at least one selected fingerprint; (b) docs shorter than k
    produce no rows; (c) identical texts produce identical fingerprint
    sets; (d) an unrelated doc does not pair at min_shared=2."""
    import random as _r

    from matcha_spark.operators.text import (
        winnow_fingerprints,
        winnow_shared_docs,
    )

    rng = _r.Random(17)
    blob = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{rng.randint(0, 10**9)}" for _ in range(n)
    )
    shared = blob(12, "sh")  # ~120 chars >> window+k-1 = 23
    rows = [
        (1, blob(30, "a") + " " + shared + " " + blob(30, "b")),
        (2, blob(25, "c") + " " + shared + " " + blob(35, "d")),
        (3, blob(60, "e")),      # unrelated
        (4, "tiny"),             # < k chars
        (5, blob(60, "e")),      # wait — new rng draws, NOT equal to 3
    ]
    docs = _span_docs(spark, rows)
    fps = winnow_fingerprints(docs, k=8, window=16)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert 4 not in by_doc  # shorter than k
    assert by_doc[1] & by_doc[2]  # the guarantee
    # identical texts -> identical sets (doc 6 duplicates doc 3)
    docs2 = _span_docs(spark, rows + [(6, rows[2][1])])
    fps2 = winnow_fingerprints(docs2, k=8, window=16)
    by2 = {}
    for r in fps2.collect():
        by2.setdefault(r.doc_id, set()).add(r.fp)
    assert by2[6] == by2[3] == by_doc[3]
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_shared_docs(
            docs, k=8, window=16, min_shared=2, max_fp_freq=None
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_winnow_max_doc_chars_chunking(spark):
    """r16 (verdict ask #6): ``max_doc_chars`` overlap-chunking.

    - IDENTITY: the chunked fingerprint set equals the unchunked set
      exactly (every original window lies fully inside a chunk; no
      chunk is shorter than t, so no spurious degenerate minima) —
      including for a shared run STRADDLING a chunk boundary;
    - the straddling pair is still found by winnow_shared_docs with
      the cap on;
    - a cap under the guarantee threshold t = window + k - 1 refuses
      loudly; docs shorter than the cap are untouched."""
    import random as _r

    from matcha_spark.operators.text import (
        winnow_fingerprints,
        winnow_shared_docs,
    )

    rng = _r.Random(23)
    blob = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{rng.randint(0, 10**9)}" for _ in range(n)
    )
    # k=8, window=4 -> t=11; cap 64 -> stride 64-10=54: doc A's first
    # chunk boundary falls at char 64, inside the shared run planted
    # at chars ~45..165
    shared = blob(12, "sh")                      # ~120 chars >> t
    head_a, head_b = blob(4, "a"), blob(11, "c")  # ~45 / ~120 chars
    rows = [
        (1, head_a + " " + shared + " " + blob(30, "b")),
        (2, head_b + " " + shared + " " + blob(25, "d")),
        (3, blob(40, "e")),       # unrelated, longer than the cap
        (4, "short doc under the cap"),
    ]
    docs = _span_docs(spark, rows)
    assert 40 <= len(rows[0][1].split(shared)[0]) <= 64  # straddle sanity

    def by_doc(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.doc_id, set()).add(r.fp)
        return out

    plain = by_doc(winnow_fingerprints(docs, k=8, window=4))
    capped = by_doc(
        winnow_fingerprints(docs, k=8, window=4, max_doc_chars=64)
    )
    assert capped == plain  # exact identity, boundary straddle included
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnow_shared_docs(
            docs, k=8, window=4, min_shared=2, max_fp_freq=None,
            max_doc_chars=64,
        ).collect()
    }
    assert (1, 2) in pairs and not any(3 in p for p in pairs)
    with pytest.raises(ValueError, match="window \\+ k - 1 = 11"):
        winnow_fingerprints(docs, k=8, window=4, max_doc_chars=10)


def test_winnow_hash_stream_not_reinlined(spark):
    """Plan-level pin for the O(chars²) trap: the k-gram hash stream
    must survive as its own projection (alias __hs, xxhash64 appearing
    ONCE) in the optimized plan — if a future optimizer change
    collapses it into the per-window lambda, every window position
    would recompute the whole stream (measured 40× at sf0.01)."""
    from matcha_spark.operators.text import winnow_fingerprints

    docs = _span_docs(spark, [(1, "a short but long enough document text")])
    plan = (
        winnow_fingerprints(docs, k=8, window=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "__hs" in plan, "hash-stream projection was collapsed away"
    assert plan.count("xxhash64") == 1, plan


def test_winnow_hot_fp_cap(spark):
    """max_fp_freq drops corpus-hot fingerprints before the self-join
    (the df-cap anti-blowup contract): with every doc sharing the same
    boilerplate, cap=2 kills the hot fingerprints and only the pair
    sharing RARE content survives."""
    from matcha_spark.operators.text import winnow_shared_docs

    boiler = "standard footer text appearing everywhere in the corpus"
    rare = "genuinely rare shared passage nine hundred something"
    rows = [
        (1, f"one {boiler} {rare}"),
        (2, f"two {boiler} {rare} tail"),
        (3, f"three {boiler} alpha"),
        (4, f"four {boiler} beta"),
    ]
    docs = _span_docs(spark, rows)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnow_shared_docs(
            docs, k=8, window=4, min_shared=2, max_fp_freq=2
        ).collect()
    }
    assert pairs == {(1, 2)}
    # r15: the opt-in pre-flight budget (same contract as
    # ngram_jaccard_pairs') fails loudly instead of launching an
    # over-budget self-join, and a generous budget changes nothing
    with pytest.raises(ValueError, match="pair_budget=1"):
        winnow_shared_docs(
            docs, k=8, window=4, min_shared=2, max_fp_freq=2, pair_budget=1
        )
    ok = {
        (r.doc_a, r.doc_b)
        for r in winnow_shared_docs(
            docs, k=8, window=4, min_shared=2, max_fp_freq=2,
            pair_budget=10**6,
        ).collect()
    }
    assert ok == pairs


def test_ngram_jaccard_doc_freq_cap(spark):
    # all 3 docs share the hot shingle "a b c" (df=3); docs 1/2 also
    # share rare shingles ("b c q", "c q r", "q r s", df=2 each)
    rows = [
        (1, "a b c q r s t1"),
        (2, "a b c q r s t2"),
        (3, "a b c x3 y3 z3 w3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.01).collect()
    }
    assert (1, 3) in uncapped and (2, 3) in uncapped  # via the hot shingle
    capped = D.ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_doc_freq=2)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # cap drops "a b c": doc 3 shares nothing rare with 1/2
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    # r15: the opt-in pre-flight budget fails loudly with the estimate
    # and the LSH pointer instead of launching an over-budget join
    with pytest.raises(ValueError, match="minhash_lsh_candidates"):
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.01, pair_budget=2)
    # at or above the true pair count: unchanged results
    ok = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(
            docs, n=3, threshold=0.01, pair_budget=10**6
        ).collect()
    }
    assert ok == uncapped


def test_calibrate_ann_floors_synthetic_clusters(spark):
    """r16 (verdict ask #4): ``calibrate_ann_floors`` measures recall
    ON THE CALLER'S corpus, closing the floors-don't-transfer caveat.
    On the 10-tight-cluster synthetic trend distribution (the gen_sf
    construction, 20k vectors) the ivfpq mean recall at the suite
    entry's levers sits WELL below the shipped corpora's 0.6 floor —
    the helper surfaces that and suggests floors 0.2 under the
    measurement — while the exhaustive parameterization still scores
    recall 1.0 exactly (the distribution-independent arm)."""
    import numpy as np

    from matcha_spark.operators.similarity import calibrate_ann_floors

    rng = np.random.default_rng(42)
    label = rng.integers(0, 10, 20_000)
    centers = rng.normal(0, 1, (10, 64))
    vecs = centers[label] + rng.normal(0, 0.35, (20_000, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).cache()
    try:
        got = calibrate_ann_floors(
            emb, "ivfpq", k=5, n_probe=12, m=16, refine=32
        )
        # measured 0.416 at the pinned seed; band absorbs partitioning
        assert 0.2 <= got["measured_mean"] <= 0.58, got
        assert got["suggested_mean_floor"] == round(
            got["measured_mean"] - 0.2, 2
        )
        assert got["suggested_mean_floor"] < 0.6  # the transfer gap, surfaced
        assert got["n_queries"] == 25
        exh = calibrate_ann_floors(
            emb, "ivfpq", k=5, n_centroids=16, n_probe=16, m=16,
            refine=10**6,
        )
        assert exh["measured_min"] == exh["measured_mean"] == 1.0
        with pytest.raises(ValueError, match="method"):
            calibrate_ann_floors(emb, "faiss")
    finally:
        emb.unpersist()


def test_suite_truth_sides_carry_pair_budget(spark, monkeypatch):
    """r16 (verdict ask #5): every exact-shingle/fingerprint truth
    side in the suite runs under the default-on _TRUTH_PAIR_BUDGET
    pre-flight — shrinking the budget to 1 makes the ENTRY itself
    refuse loudly (proving the wiring reaches the join), and the
    generous default leaves results untouched (the driver-green
    window pins that continuously)."""
    from matcha_spark import suite

    monkeypatch.setattr(suite, "_TRUTH_PAIR_BUDGET", 1)
    for entry in (
        suite.doc_ngram_jaccard,
        suite.dedup_near_docs,
        suite.dedup_keep_best_docs,
        suite.doc_minhash_recall_sound,
        suite.dedup_near_lsh_sound,
        suite.doc_winnow_pairs,
    ):
        with pytest.raises(ValueError, match="pair_budget=1"):
            entry(spark, SF_DIR).collect()


def test_graph_cache_bounded_eviction(spark):
    from matcha_spark import suite

    saved, saved_max = dict(suite._GRAPH_CACHE), suite._GRAPH_CACHE_MAX
    suite._GRAPH_CACHE.clear()
    suite._GRAPH_CACHE_MAX = 2
    try:
        suite._graph(spark, SF_DIR)
        g1 = suite._graph(spark, SF_DIR, include_orders=True)
        suite._graph(spark, SF_DIR, include_orders=True, order_priority="1-URGENT")
        assert len(suite._GRAPH_CACHE) == 2  # oldest evicted
        # evicted (uncached) graphs still answer queries correctly
        base_again = suite._graph(spark, SF_DIR)
        assert base_again.df.count() > 0
        assert g1.df.count() >= base_again.df.count()
    finally:
        suite._GRAPH_CACHE.clear()
        suite._GRAPH_CACHE.update(saved)
        suite._GRAPH_CACHE_MAX = saved_max


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    exact = {(r["q_id"], r["n_id"]) for r in S.cosine_topk(emb, q, k=5).collect()}
    # probing every cell is exhaustive search -> recall 1.0
    allcells = {
        (r["q_id"], r["n_id"])
        for r in S.ivf_topk(emb, q, k=5, n_centroids=8, n_probe=8).collect()
    }
    assert allcells == exact
    # partial probing trades recall for touched fraction
    part = {
        (r["q_id"], r["n_id"])
        for r in S.ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).collect()
    }
    assert len(exact & part) / len(exact) >= 0.5


def test_ivfpq_recall_and_pruning(spark):
    """r14 IVF-PQ composition: (a) probe-all + generous refine is
    near-exhaustive (residual codes only gate the REFINE candidate
    set, so recall vs brute force stays high); (b) partial probing
    still finds most true neighbors (the ivf_topk bound); (c) a
    planted exact duplicate of the query lands in the query's own
    top-probed cell and re-ranks to rank 1 even at n_probe=1."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    exact = {(r.q_id, r.n_id) for r in S.cosine_topk(emb, q, k=5).collect()}
    # probe every cell + exhaustive refine -> exact (same invariant
    # shape as the flat-PQ and IVF exhaustive twins)
    n = emb.count()
    full = {
        (r.q_id, r.n_id)
        for r in S.ivfpq_topk(
            emb, q, k=5, n_centroids=8, n_probe=8, m=8, nbits=4, refine=n
        ).collect()
    }
    assert full == exact
    part = {
        (r.q_id, r.n_id)
        for r in S.ivfpq_topk(
            emb, q, k=5, n_centroids=8, n_probe=4, m=8, nbits=4, refine=8
        ).collect()
    }
    assert len(exact & part) / len(exact) >= 0.5
    dups = q.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    planted = S.ivfpq_topk(
        emb.select("vec_id", "embedding").unionByName(dups),
        q, k=1, n_centroids=8, n_probe=1, m=8, nbits=4, refine=4,
    )
    got = {(r.q_id, r.n_id) for r in planted.where("rank = 1").collect()}
    assert got == {(i, i + 100000) for i in range(3)}


def test_load_tables_scopes_nanos_conf(spark):
    """The events read must not leak the legacy nanosAsLong conf into
    the session: it is restored after schema resolution, the events
    DataFrame stays fully readable, and unrelated reads are untouched."""
    from matcha_spark.sources.tpch_graph import load_tables

    key = "spark.sql.legacy.parquet.nanosAsLong"
    t = load_tables(spark, SF_DIR, "events", "orders")
    assert spark.conf.get(key, None) is None, "session conf leaked"
    # new fixtures read natively as TIMESTAMP_NTZ(micros); legacy
    # TIMESTAMP(NANOS) footers land as LTZ via the ns-as-long fallback
    assert dict(t["events"].dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert t["events"].select("ts").where("ts IS NOT NULL").count() > 0
    assert t["orders"].count() > 0


def test_ivf_recall_on_skew_ordered_corpus(spark):
    """Quantizer-sampling bias audit: the corpus is stored SORTED by
    cluster, so a head-of-first-partition sample (a bare ``limit``)
    would train k-means on one cluster only and partial-probe recall
    collapses.  The seeded-hash sample must see every cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 8, 50, 8
    centers = rng.normal(size=(n_clusters, dim)) * 10.0
    rows = []
    vid = 0
    for c in range(n_clusters):  # storage order = cluster order (skew)
        for _ in range(per):
            v = centers[c] + rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(1)
    q = emb.where(f"vec_id >= {vid - 3}")  # queries from the LAST cluster
    exact = {(r["q_id"], r["n_id"]) for r in S.cosine_topk(emb, q, k=5).collect()}
    part = {
        (r["q_id"], r["n_id"])
        for r in S.ivf_topk(
            emb, q, k=5, n_centroids=8, n_probe=2, sample_size=64
        ).collect()
    }
    assert len(exact & part) / len(exact) >= 0.8


def test_strip_boilerplate_planted(spark):
    bp = "copyright 2024 example corp"
    rows = [
        (1, f"unique first line\n{bp}\nreal content one"),
        (2, f"{bp}\nreal content two"),
        (3, f"other text\n{bp}"),
        (4, bp),  # nothing but boilerplate
        (5, "no shared lines here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    found = {r["norm"] for r in T.boilerplate_lines(docs, min_doc_freq=3).collect()}
    assert found == {bp}
    out = {r["doc_id"]: r["text"] for r in T.strip_boilerplate(docs, min_doc_freq=3).collect()}
    assert out[1] == "unique first line\nreal content one"  # order preserved
    assert out[2] == "real content two"
    assert out[3] == "other text"
    assert out[4] == ""  # fully-boilerplate doc survives as empty
    assert out[5] == "no shared lines here"
    assert len(out) == 5


def test_scrub_pii_patterns(spark):
    rows = [(1, "mail a.b+c@ex-ample.org or call +1 (555) 123-4567 from 10.0.0.1 ok")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.scrub_pii(docs).collect()[0]["text"]
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "@" not in out and "555" not in out and "10.0.0.1" not in out
    assert out.startswith("mail ") and out.endswith(" ok")


def test_quality_filter_cuts(spark):
    rows = [
        (1, "the cat sat on the mat and then it ran away happily today"),  # good
        (2, "aa bb"),  # too short
        (3, "!!! ??? ... ;;; ::: @@@ $$$ %%% ^^^ &&&"),  # punct-heavy, no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in T.quality_filter(docs, min_tokens=5, max_punct_ratio=0.2, min_stopword_ratio=0.05).collect()}
    assert kept == {1}


def test_corpus_stats(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "d e")], "doc_id long, text string"
    )
    r = T.corpus_stats(docs).collect()[0]
    assert (r["n_docs"], r["n_tokens"], r["n_unique_docs"]) == (3, 8, 2)


def test_audio_features_and_resize(spark):
    rows = [
        (1, "image", "jpeg", 8, 8, None, bytearray(b"\x01\x02")),
        (5, "audio", "wav", None, None, 2000, bytearray(b"\xaa\xbb")),
        (6, "audio", "wav", None, None, 1000, bytearray(b"\xaa\xbb")),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    af = {r["media_id"]: r for r in M.audio_features(media).collect()}
    assert set(af) == {5, 6}
    assert af[5]["n_samples"] == 256 and 0.0 < af[5]["rms"] < 1.0
    assert af[5]["rms"] == af[6]["rms"]  # same payload → deterministic features
    resized = M.resize_images(media, target=(4, 4)).collect()
    assert len(resized) == 1
    r = resized[0]
    assert (r["width"], r["height"], r["format"]) == (4, 4, "raw_f32")
    assert len(bytes(r["payload"])) == 4 * 4 * 4  # 16 float32 pixels
    with pytest.raises(NotImplementedError):
        M.strict_decode_audio(b"x")


def _planted_embeddings(spark, n=40, seed=7):
    """Random 64-dim corpus plus three planted near-dups (41~0, 42~1,
    43~1) at cosine ≈ 0.999; random pairs sit well below 0.6."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j, src in [(41, 0), (42, 1), (43, 1)]:
        rows.append(
            (j, [float(x) for x in base[src] + rng.normal(scale=0.01, size=64)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_dup_pairs_exact(spark):
    emb = _planted_embeddings(spark)
    pairs = D.embedding_dup_pairs(emb, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 41), (1, 42), (1, 43), (42, 43)}
    assert all(r.cosine >= 0.95 for r in pairs)


def test_embedding_dup_pairs_blocks_invariant(spark):
    """The block count is a parallelism knob, not a semantic one: every
    unordered pair must be met exactly once for any grid size."""
    emb = _planted_embeddings(spark)
    want = {(r.id_a, r.id_b) for r in D.embedding_dup_pairs(emb, threshold=0.95, blocks=1).collect()}
    for blocks in (3, 16):
        got = D.embedding_dup_pairs(emb, threshold=0.95, blocks=blocks).collect()
        assert {(r.id_a, r.id_b) for r in got} == want
        assert len(got) == len(want), f"duplicate pair rows at blocks={blocks}"


def test_embedding_dup_pairs_lsh_recall_on_near_dups(spark):
    """Planted near-dups at cosine ≈ 0.999 are ~0° apart: every table's
    bucket collides, so LSH recall on them is 1.0 — and verification
    keeps precision exact (no pair below threshold)."""
    emb = _planted_embeddings(spark)
    got = {(r.id_a, r.id_b) for r in D.embedding_dup_pairs_lsh(emb, threshold=0.95).collect()}
    assert got == {(0, 41), (1, 42), (1, 43), (42, 43)}


def test_dedup_near_embeddings_keep_mapping(spark):
    emb = _planted_embeddings(spark)
    for method in ("exact", "lsh"):
        keep = D.dedup_near_embeddings(emb, threshold=0.95, method=method).collect()
        assert len(keep) == 43
        nontrivial = {(r.vec_id, r.keep_vec_id) for r in keep if r.vec_id != r.keep_vec_id}
        assert nontrivial == {(41, 0), (42, 1), (43, 1)}, method


def test_sign_buckets_shape_and_determinism(spark):
    emb = _planted_embeddings(spark)
    b = S.sign_buckets(emb, "embedding", n_planes=6, n_tables=3)
    rows = b.collect()
    assert len(rows) == 43 * 3  # one row per (vector, table)
    assert {r.table for r in rows} == {0, 1, 2}
    assert all(0 <= r.bucket < 64 for r in rows)  # 6 sign bits
    again = {(r.vec_id, r.table, r.bucket) for r in b.collect()}
    assert again == {(r.vec_id, r.table, r.bucket) for r in rows}


def test_image_features_real_codec_plug_point(spark):
    """Run the SHIPPED Pillow integration (operators.codecs) through
    the pluggable decode seam — proves ``image_features(decoder=
    pillow_decode_image)`` works out-of-the-box where Pillow exists;
    skips cleanly where it doesn't (the deterministic fake twins
    remain the CI path)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from matcha_spark.operators import codecs
    from matcha_spark.operators.multimodal import image_features

    assert codecs.available()["pillow"] is True
    assert codecs.default_image_decoder() is codecs.pillow_decode_image

    def png_bytes(w, h, val):
        img = PIL.new("L", (w, h), val)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", png_bytes(4, 3, 10)),
        (2, "image", png_bytes(2, 2, 255)),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {
        r.media_id: r
        for r in image_features(
            media, decoder=codecs.pillow_decode_image
        ).collect()
    }
    # constant-value images: every row-mean equals the fill value
    assert [round(x) for x in out[1].feature] == [10, 10, 10]
    assert [round(x) for x in out[2].feature] == [255, 255]
    assert out[1].n_bytes > 0 and len(out[1].sha256) == 64


def test_codecs_fall_back_to_fakes_without_libs():
    """The codec registry degrades to the deterministic fakes when the
    optional libraries are absent — and never raises at import time."""
    from matcha_spark.operators import codecs, multimodal

    avail = codecs.available()
    assert set(avail) == {"pillow", "soundfile"}
    img_dec = codecs.default_image_decoder()
    if not avail["pillow"]:
        assert img_dec is multimodal.fake_decode_image
    aud_dec = codecs.default_audio_decoder()
    if not avail["soundfile"]:
        assert aud_dec is multimodal.fake_decode_audio
    # either way the returned decoder is a working bytes -> ndarray fn
    # (fake path only — real codecs need real payloads)
    if not avail["pillow"]:
        assert img_dec(b"xyz").shape == (8, 8)
    if not avail["soundfile"]:
        assert aud_dec(b"xyz").shape == (256,)


def test_minhash_bucket_cap_bounds_hot_buckets(spark):
    """A boilerplate flood (many identical docs) fills one band bucket;
    the cap drops that bucket's quadratic pair fan-out while distinct
    near-dup pairs elsewhere survive."""
    flood = [(i, "exactly the same boilerplate license page text here") for i in range(40)]
    pair = [
        (100, "a genuinely unique document about spark and parquet tables"),
        (101, "a genuinely unique document about spark and parquet files"),
    ]
    docs = spark.createDataFrame(flood + pair, "doc_id long, text string")
    uncapped = D.minhash_lsh_candidates(docs)
    assert uncapped.count() >= 40 * 39 / 2  # the flood dominates
    capped = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_candidates(docs, max_bucket_size=10).collect()
    }
    assert (100, 101) in capped  # real near-dup survives
    assert not any(a < 40 and b < 40 for a, b in capped)  # flood pairs gone


def test_semdedup_planted_and_invariants(spark):
    """SemDeDup on the planted corpus: near-dup pairs at cosine ≈ 0.999
    land in the same k-means cell (they are ~0° apart, far closer to
    each other than to any centroid boundary at this scale), so the
    greedy prune drops the higher id of each pair; every other vector
    is kept.  Also pins the structural invariants: one row per input,
    dup_of NULL iff kept, dup_of is a kept lower id in the same
    cluster, and determinism across runs."""
    emb = _planted_embeddings(spark)
    out = D.semdedup(emb, threshold=0.95, n_clusters=4).collect()
    assert len(out) == 43
    by_id = {r.vec_id: r for r in out}
    # planted dups removed, shadowed by their source
    assert not by_id[41].keep and by_id[41].dup_of == 0
    assert not by_id[42].keep and by_id[42].dup_of == 1
    # 43 ~ 1 too, but 42 (≈ same point) may shadow it first — either way
    # the keeper must be the cluster representative 1
    assert not by_id[43].keep and by_id[43].dup_of in (1, 42)
    kept = {r.vec_id for r in out if r.keep}
    assert kept == set(range(40))  # all originals survive
    for r in out:
        if r.keep:
            assert r.dup_of is None
        else:
            assert r.dup_of in by_id and by_id[r.dup_of].keep
            assert by_id[r.dup_of].cluster == r.cluster
            assert r.dup_of < r.vec_id
    again = {(r.vec_id, r.keep, r.dup_of) for r in D.semdedup(emb, threshold=0.95, n_clusters=4).collect()}
    assert again == {(r.vec_id, r.keep, r.dup_of) for r in out}


def test_dup_ngram_stats_planted(spark):
    """A 5-gram shared by two docs (and repeated within one) marks all
    its positions duplicated; unique tails don't.  Short docs report
    0/0/0.0."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e unique tail one"),
            (2, "a b c d e different ending here"),
            (3, "x y z w v a b c d e a b c d e"),  # shared gram twice
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.dup_ngram_stats(docs, n=5).collect()}
    assert rows[4].n_grams == 0 and rows[4].dup_grams == 0 and rows[4].dup_ratio == 0.0
    # doc 1: grams at positions 1..4 -> 4 grams; only 'a b c d e' duplicated
    assert rows[1].n_grams == 4 and rows[1].dup_grams == 1
    assert rows[2].n_grams == 4 and rows[2].dup_grams == 1
    # doc 3: 15 tokens -> 11 grams; 'a b c d e' occurs at pos 6 and 11
    assert rows[3].n_grams == 11 and rows[3].dup_grams == 2
    assert abs(rows[3].dup_ratio - 2 / 11) < 1e-6


def _grad_decoder(payload: bytes):
    """Structured test decoder: payload[0] selects the image structure
    (a rich-spectrum seeded random base — pHash needs natural-image-like
    spectra; an overly smooth gradient has near-degenerate low
    frequencies and its median-thresholded bits flip on any noise),
    payload[1] a small-noise seed — same structure + different noise ≈
    near-duplicate images; different structures are far apart."""
    import numpy as np

    shape_seed, noise_seed = payload[0], payload[1]
    base = np.random.default_rng(int(shape_seed)).normal(size=(32, 32)) * 50.0
    noise = np.random.default_rng(1000 + int(noise_seed)).normal(
        scale=1.0, size=(32, 32)
    )
    return base + noise


def test_image_phash_properties(spark):
    rows = [
        (1, "image", bytearray([1, 0])),   # structure 1
        (2, "image", bytearray([1, 7])),   # structure 1, different noise
        (3, "image", bytearray([9, 0])),   # different structure
        (4, "image", bytearray([1, 0])),   # identical to 1
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    h = {r.media_id: r.phash for r in M.image_phash(media, decoder=_grad_decoder).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert h[1] == h[4]                      # identical image, identical hash
    assert ham(h[1], h[2]) <= 6              # same structure, noise only
    assert ham(h[1], h[3]) > 10              # different structure
    # brightness invariance: median thresholding ignores a constant shift
    bright = lambda p: _grad_decoder(p) + 30.0
    h2 = {r.media_id: r.phash for r in M.image_phash(media, decoder=bright).collect()}
    assert h2 == h


def test_phash_near_dup_pairs_complete(spark):
    """Banded pairs == brute-force pairs within the Hamming bound
    (pigeonhole recall 1.0), and verified distances are exact."""
    rows = [(i, "image", bytearray([i % 3, i // 3])) for i in range(12)]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    h = {r.media_id: r.phash for r in M.image_phash(media, decoder=_grad_decoder).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (a, b, ham(h[a], h[b]))
        for a in h for b in h
        if a < b and ham(h[a], h[b]) <= 6
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in M.phash_near_dup_pairs(media, max_hamming=6, decoder=_grad_decoder).collect()
    }
    assert got == want and len(want) >= 3  # the 3 same-structure groups pair up


def test_pq_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    exact = {(r["q_id"], r["n_id"]) for r in S.cosine_topk(emb, q, k=5).collect()}
    # exhaustive refine: every vector re-ranked exactly -> recall 1.0
    n = emb.count()
    full = {
        (r["q_id"], r["n_id"])
        for r in S.pq_topk(emb, q, k=5, m=8, nbits=4, refine=n).collect()
    }
    assert full == exact
    # typical config: top-20 ADC candidates re-ranked; quantized scores
    # are approximate by design but must carry most of the signal
    approx = {
        (r["q_id"], r["n_id"])
        for r in S.pq_topk(emb, q, k=5, m=8, nbits=4, refine=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_rerank_broadcast_gate(spark, monkeypatch):
    """_rerank_exact broadcasts the candidate set only while the
    Q*k*refine estimate stays under _RERANK_BROADCAST_MAX_CANDS (r15
    advice: an unconditional hint with refine=10**6 collects ~Q x
    corpus to the driver).  Forcing the gate shut (threshold 0 -> the
    candidate ids join by shuffle; the tiny query frame stays
    broadcast) must never change the results."""
    from matcha_spark.operators import similarity as sim_mod

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where("vec_id < 3")
    small = S.pq_topk(emb, q, k=5, m=8, nbits=4, refine=4)
    monkeypatch.setattr(sim_mod, "_RERANK_BROADCAST_MAX_CANDS", 0)
    gated = S.pq_topk(emb, q, k=5, m=8, nbits=4, refine=4)
    rows = lambda df: {(r["q_id"], r["n_id"], r["rank"]) for r in df.collect()}
    assert rows(small) == rows(gated)


def test_pq_rejects_indivisible_dim(spark):
    """m must divide the embedding dim; dim=64 with m=7 is a typed
    refusal, not a silent truncation."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError):
        S.pq_topk(emb, emb.where("vec_id < 2"), m=7)


def test_incremental_dedup_near_batches(spark):
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other_text = "one two three four five six seven eight nine ten"
    b1 = spark.createDataFrame(
        [
            (10, base_text),
            (11, base_text + " lambda"),            # near-dup of 10
            (12, other_text),
            (13, "completely different words in this document entirely"),
        ],
        "doc_id long, text string",
    )
    d1, sigs1 = D.incremental_dedup_near(b1, None, threshold=0.6)
    dec1 = {r.doc_id: r for r in d1.collect()}
    assert dec1[10].keep and dec1[12].keep and dec1[13].keep
    assert not dec1[11].keep and dec1[11].dup_of == 10
    assert sigs1.count() == 3  # only kept docs enter the store

    b2 = spark.createDataFrame(
        [
            (20, base_text),                         # re-submission of accepted 10
            (21, other_text + " eleven"),            # near-dup of accepted 12
            (22, "fresh content nothing like anything else around here"),
            (23, base_text + " lambda"),             # dup of REJECTED 11 == near 10
        ],
        "doc_id long, text string",
    )
    d2, sigs2 = D.incremental_dedup_near(b2, sigs1, threshold=0.6)
    dec2 = {r.doc_id: r for r in d2.collect()}
    assert not dec2[20].keep and dec2[20].dup_of == 10   # corpus wins
    assert not dec2[21].keep and dec2[21].dup_of == 12
    assert dec2[22].keep and dec2[22].dup_of is None
    assert not dec2[23].keep and dec2[23].dup_of == 10   # chained to corpus
    assert sigs2.count() == 4  # 3 accepted + doc 22

    # all-fresh batch: empty dup-edge set must not break the machinery
    b3 = spark.createDataFrame(
        [(30, "nothing here matches the accepted corpus at all honestly")],
        "doc_id long, text string",
    )
    d3, sigs3 = D.incremental_dedup_near(b3, sigs2, threshold=0.6)
    assert [r.keep for r in d3.collect()] == [True]
    assert sigs3.count() == 5


def test_incremental_dedup_simhash_batches(spark):
    """SimHash store recipe (r09): batch-vs-store admission on 16-byte
    signatures — re-uploads rejected against the corpus (corpus-wins
    keeper), chained batch dups rejected transitively, fresh and
    empty-text docs kept, store grows by kept docs only."""
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other_text = "one two three four five six seven eight nine ten"
    b1 = spark.createDataFrame(
        [
            (10, base_text),
            (11, base_text),  # exact dup of 10 (hamming 0)
            (12, other_text),
            (13, ""),         # zero signature: never a candidate, kept
        ],
        "doc_id long, text string",
    )
    d1, sigs1 = D.incremental_dedup_simhash(b1, None, max_hamming=3)
    dec1 = {r.doc_id: r for r in d1.collect()}
    assert dec1[10].keep and dec1[12].keep and dec1[13].keep
    assert not dec1[11].keep and dec1[11].dup_of == 10
    assert sigs1.count() == 3

    b2 = spark.createDataFrame(
        [
            (20, base_text),   # re-submission of accepted 10
            (21, "fresh content nothing like anything else around here"),
            (22, base_text),   # chained: dup of 20 AND of corpus 10
            (23, ""),          # another zero signature — NOT a dup of 13
        ],
        "doc_id long, text string",
    )
    d2, sigs2 = D.incremental_dedup_simhash(b2, sigs1, max_hamming=3)
    dec2 = {r.doc_id: r for r in d2.collect()}
    assert not dec2[20].keep and dec2[20].dup_of == 10  # corpus wins
    assert dec2[21].keep and dec2[21].dup_of is None
    assert not dec2[22].keep and dec2[22].dup_of == 10  # chained to corpus
    assert dec2[23].keep
    assert sigs2.count() == 5  # 3 + fresh 21 + empty 23

    # near (not exact) duplicate within the Hamming bound still rejects
    from matcha_spark.operators.dedup import simhash

    near_text = base_text + " lambda"
    h = {
        r.doc_id: r.simhash
        for r in simhash(
            spark.createDataFrame(
                [(0, base_text), (1, near_text)], "doc_id long, text string"
            )
        ).collect()
    }
    dist = bin((h[0] ^ h[1]) & ((1 << 64) - 1)).count("1")
    d3, _ = D.incremental_dedup_simhash(
        spark.createDataFrame([(30, near_text)], "doc_id long, text string"),
        sigs2,
        max_hamming=dist,
    )
    row = {r.doc_id: r for r in d3.collect()}[30]
    assert not row.keep and row.dup_of == 10


def test_dedup_family_string_doc_ids(spark):
    """String-keyed corpora (JSONL sources with ``id_field=``) flow
    through the whole dedup family: simhash adopts the input id type,
    and every downstream step (banding, contraction, union-find,
    corpus-wins keeper) compares ids lexicographically — the keeper is
    the MIN id in that order, same contract as long ids."""
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other_text = "one two three four five six seven eight nine ten"
    b1 = spark.createDataFrame(
        [("doc-a", base_text), ("doc-b", base_text), ("doc-c", other_text)],
        "doc_id string, text string",
    )
    sig = D.simhash(b1)
    assert sig.schema["doc_id"].dataType.simpleString() == "string"

    d1, sigs1 = D.incremental_dedup_simhash(b1, None, max_hamming=3)
    dec1 = {r.doc_id: r for r in d1.collect()}
    assert dec1["doc-a"].keep and dec1["doc-c"].keep
    assert not dec1["doc-b"].keep and dec1["doc-b"].dup_of == "doc-a"

    # corpus-wins across a store round: a string-id resubmission
    b2 = spark.createDataFrame(
        [("doc-0", base_text)], "doc_id string, text string"
    )
    d2, _ = D.incremental_dedup_simhash(b2, sigs1, max_hamming=3)
    row = d2.collect()[0]
    # corpus wins even though "doc-0" < "doc-a" lexicographically
    assert not row.keep and row.dup_of == "doc-a"

    # the MinHash path too (built-ins throughout, no kernel schema)
    d3, _ = D.incremental_dedup_near(b1, None, threshold=0.6)
    dec3 = {r.doc_id: r for r in d3.collect()}
    assert dec3["doc-a"].keep and not dec3["doc-b"].keep
    assert dec3["doc-b"].dup_of == "doc-a"

    # batch keep-one over string ids (connected components included)
    keep = {r.doc_id: r.keep_doc_id for r in D.dedup_near_docs(
        b1, threshold=0.6).collect()}
    assert keep["doc-a"] == "doc-a" and keep["doc-b"] == "doc-a"
    assert keep["doc-c"] == "doc-c"


def test_signature_store_roundtrip(spark, tmp_path):
    """The incremental-dedup handoff survives a parquet round-trip: the
    reloaded store makes identical decisions."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    _, sigs = D.incremental_dedup_near(docs, None)
    D.save_signature_store(sigs, str(tmp_path / "store"))
    loaded = D.load_signature_store(spark, str(tmp_path / "store"))
    resub = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    d, _ = D.incremental_dedup_near(resub, loaded, threshold=0.6)
    row = d.collect()[0]
    assert not row.keep and row.dup_of == 1


def test_video_near_dup_pairs_planted(spark):
    """Frame-overlap video dedup: an exact re-upload matches on every
    frame; a video sharing only a prefix matches on those frames; an
    unrelated video matches nothing; tail ranges past the payload never
    hash (no empty-slice false positives)."""
    import os

    from matcha_spark.operators.multimodal import video_near_dup_pairs

    K = 256  # frame_bytes for the test
    base = os.urandom(K * 4)  # 4 full frames
    prefix_shared = base[: K * 2] + os.urandom(K * 2)
    rows = [
        (1, "video", None, None, None, 3000, bytearray(base)),
        (2, "video", None, None, None, 3000, bytearray(base)),  # re-upload
        (3, "video", None, None, None, 3000, bytearray(prefix_shared)),
        (4, "video", None, None, None, 3000, bytearray(os.urandom(K * 4))),
        (5, "video", None, None, None, 500, bytearray(os.urandom(64))),  # short
        (6, "image", None, None, None, None, bytearray(base)),  # not a video
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, format string, width int, height int, "
        "duration_ms long, payload binary",
    )
    out = {
        (r.vid_a, r.vid_b): r.shared_frames
        for r in video_near_dup_pairs(
            media, every_ms=1000, frame_bytes=K, max_hamming=0,
            min_shared_frames=1,
        ).collect()
    }
    # 3000ms @ 1000ms -> frame_idx 0..3, payload holds exactly 4 frames
    assert out[(1, 2)] == 4
    assert out[(1, 3)] == 2 and out[(2, 3)] == 2
    assert not any(4 in p or 5 in p or 6 in p for p in out)
    # threshold prunes the weak prefix match
    strict = {
        (r.vid_a, r.vid_b)
        for r in video_near_dup_pairs(
            media, every_ms=1000, frame_bytes=K, max_hamming=0,
            min_shared_frames=3,
        ).collect()
    }
    assert strict == {(1, 2)}


def test_video_near_dup_frame_key_guard(spark):
    """Regression (r09 advice): the packed frame key (media_id * 1e6 +
    frame_idx) must FAIL LOUDLY instead of silently aliasing frames
    when frame_idx >= 1e6 or media_id < 0."""
    import os

    import pytest

    from matcha_spark.operators.multimodal import video_near_dup_pairs

    # 1-byte frames + a 1.2 MB payload: frame_idx reaches past 1e6 with
    # the frames still INSIDE the payload (the slicer would keep them)
    media = spark.createDataFrame(
        [(1, "video", None, None, None, 2_000_000,
          bytearray(os.urandom(1_200_000)))],
        "media_id long, kind string, format string, width int, height int, "
        "duration_ms long, payload binary",
    )
    with pytest.raises(Exception, match="packing range"):
        video_near_dup_pairs(media, every_ms=1, frame_bytes=1).collect()
    K = 64
    neg = spark.createDataFrame(
        [(-1, "video", None, None, None, 3000, bytearray(os.urandom(K * 4)))],
        "media_id long, kind string, format string, width int, height int, "
        "duration_ms long, payload binary",
    )
    with pytest.raises(Exception, match="packing range"):
        video_near_dup_pairs(neg, every_ms=1000, frame_bytes=K).collect()


def test_video_near_dup_custom_frame_slicer(spark):
    """The frame_slicer= seam (r09): injecting a demuxer that slices
    from a header offset changes which videos pair, proving the slicer
    output (not the fixed-stride default) feeds the hash join; the
    default path is untouched."""
    import os

    from pyspark.sql import functions as F

    from matcha_spark.operators.multimodal import video_near_dup_pairs

    K = 256
    HDR = 16
    frames = os.urandom(K * 3)
    # same frame payloads behind DIFFERENT header bytes: the default
    # stride slicer sees different frame 0 (header included) so videos
    # only match from frame 1 on; a header-aware slicer aligns them all
    v1 = os.urandom(HDR) + frames
    v2 = os.urandom(HDR) + frames
    media = spark.createDataFrame(
        [
            (1, "video", None, None, None, 2500, bytearray(v1)),
            (2, "video", None, None, None, 2500, bytearray(v2)),
        ],
        "media_id long, kind string, format string, width int, height int, "
        "duration_ms long, payload binary",
    )

    def header_slicer(df, frame_bytes):
        return df.where(
            F.length("payload") >= HDR + (F.col("frame_idx") + 1) * frame_bytes
        ).select(
            "media_id",
            "frame_idx",
            F.expr(
                f"substring(payload, {HDR} + frame_idx * {frame_bytes} + 1, "
                f"{frame_bytes})"
            ).alias("payload"),
        )

    custom = {
        (r.vid_a, r.vid_b): r.shared_frames
        for r in video_near_dup_pairs(
            media, every_ms=1000, frame_bytes=K, max_hamming=0,
            min_shared_frames=1, frame_slicer=header_slicer,
        ).collect()
    }
    assert custom[(1, 2)] == 3  # all three frames align behind the header


def test_audio_near_dup_pairs_planted(spark):
    """Audio fingerprint overlap: an exact re-upload shares every
    window; clips sharing a prefix segment share its windows; unrelated
    clips don't pair.  A raw-byte decoder makes waveform overlap
    controllable."""
    import os

    import numpy as np

    from matcha_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    def raw_decode(payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float64) / 128.0 - 1.0

    rng = np.random.default_rng(5)
    seg1 = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    seg2 = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    seg3 = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    rows = [
        (1, "audio", bytearray(seg1 + seg2)),
        (2, "audio", bytearray(seg1 + seg2)),  # exact re-upload
        (3, "audio", bytearray(seg1 + seg3)),  # shares the first segment
        (4, "audio", bytearray(seg3 + seg3)),  # shares seg3 with clip 3 only
        (5, "audio", bytearray(os.urandom(40))),  # too short to window
        (6, "video", bytearray(seg1)),  # not audio
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    fps = audio_fingerprint(media, decoder=raw_decode)
    per = {r[0]: r[1] for r in fps.groupBy("media_id").count().collect()}
    # 1024 samples, window 64 stride 32 -> 31 windows -> 30 bit rows
    assert per[1] == 30 and per[2] == 30
    assert 5 not in per and 6 not in per
    out = {
        (r.aud_a, r.aud_b): r.shared_windows
        for r in audio_near_dup_pairs(
            media, decoder=raw_decode, min_shared_windows=4
        ).collect()
    }
    assert out[(1, 2)] == 30  # identical: every window agrees
    # prefix sharers: ~15 aligned seg1 windows minus the boundary ones
    assert out.get((1, 3), 0) >= 10 and out.get((2, 3), 0) >= 10
    # clip 4 shares ONLY seg3 — pairs with 3, never with 1/2
    assert out.get((3, 4), 0) >= 10
    assert (1, 4) not in out and (2, 4) not in out
    assert not any(5 in p or 6 in p for p in out)


def test_embedding_dedup_string_vec_ids(spark):
    """The embedding-dedup family is id-type-agnostic too (uuid-keyed
    vector stores): semdedup, exact and LSH pair kernels, keep-one, and
    the incremental store all adopt a string id type, with min-id (here
    lexicographic) keeper semantics."""
    import math

    def vec(theta):
        return [float(math.cos(theta)), float(math.sin(theta)), 0.0, 0.0]

    emb = spark.createDataFrame(
        [("v-a", vec(0.0)), ("v-b", vec(0.02)), ("v-c", vec(1.5))],
        "vec_id string, embedding array<float>",
    )
    out = {r.vec_id: r for r in D.semdedup(
        emb, threshold=0.99, n_clusters=1).collect()}
    assert out["v-a"].keep and not out["v-b"].keep
    assert out["v-b"].dup_of == "v-a" and out["v-c"].keep

    pairs = {(r.id_a, r.id_b): r.cosine for r in D.embedding_dup_pairs(
        emb, threshold=0.99, blocks=2).collect()}
    assert set(pairs) == {("v-a", "v-b")}
    lsh = {(r.id_a, r.id_b) for r in D.embedding_dup_pairs_lsh(
        emb, threshold=0.99, dim=4, n_planes=4, n_tables=8).collect()}
    assert ("v-a", "v-b") in lsh

    keep = {r.vec_id: r.keep_vec_id for r in D.dedup_near_embeddings(
        emb, threshold=0.99, blocks=2).collect()}
    assert keep == {"v-a": "v-a", "v-b": "v-a", "v-c": "v-c"}

    # incremental store: batch 2 re-upload rejected against the store
    d1, store = D.incremental_semdedup(emb, None, threshold=0.99, n_clusters=1)
    assert {r.vec_id for r in d1.where("keep").collect()} == {"v-a", "v-c"}
    b2 = spark.createDataFrame(
        [("v-0", vec(0.01)), ("v-z", vec(3.0))],
        "vec_id string, embedding array<float>",
    )
    d2, store2 = D.incremental_semdedup(b2, store, threshold=0.99)
    got = {r.vec_id: r for r in d2.collect()}
    # corpus wins though "v-0" < "v-a" lexicographically
    assert not got["v-0"].keep and got["v-0"].dup_of == "v-a"
    assert got["v-z"].keep
    # store: 1 centroid row (vec_id NULL — reserved, collision-free
    # with any real id; r12 advice) + v-a, v-c, v-z
    assert {r.vec_id for r in store2.collect()} == {None, "v-a", "v-c", "v-z"}


def test_incremental_semdedup_centroid_id_no_collision(spark):
    """r12 advice: a string-keyed corpus with a REAL vector id '0'
    (the value centroid rows used to render into) must not produce two
    store rows under one id — grouping the store by vec_id stays
    unambiguous because centroid rows carry NULL."""
    import numpy as np

    def vec(x):
        return [float(v) for v in np.eye(4)[0] * 0 + [x, 1.0, 0.0, 0.0]]

    emb = spark.createDataFrame(
        [("0", vec(1.0)), ("1", vec(-1.0))],
        "vec_id string, embedding array<float>",
    )
    dec, store = D.incremental_semdedup(emb, None, threshold=0.99, n_clusters=2)
    rows = store.collect()
    per_id = {}
    for r in rows:
        per_id.setdefault(r.vec_id, []).append(r)
    # every real id appears exactly once; centroid rows are all NULL
    assert len(per_id.get("0", [])) == 1 and len(per_id.get("1", [])) == 1
    assert all(r.centroid for r in per_id.get(None, []))
    assert {r.vec_id for r in dec.where("keep").collect()} == {"0", "1"}


def test_incremental_semdedup_batches(spark):
    """r11: store-based SemDeDup — two-batch admission with pinned
    centroids, corpus-wins dup_of, store round-trip through parquet,
    and a dup-free batch."""
    import math
    import tempfile

    def vec(theta):
        return [float(math.cos(theta)), float(math.sin(theta)), 0.0, 0.0]

    # batch 1: two well-separated directions plus a near-copy of the
    # first (cos ~ 0.9995) that must be pruned inside the batch
    b1 = spark.createDataFrame(
        [(1, vec(0.0)), (2, vec(1.5)), (3, vec(0.03))],
        "vec_id long, embedding array<float>",
    )
    d1, store1 = D.incremental_semdedup(b1, None, threshold=0.99, n_clusters=2)
    dec1 = {r.vec_id: r for r in d1.collect()}
    assert dec1[1].keep and dec1[2].keep
    assert not dec1[3].keep and dec1[3].dup_of == 1
    assert store1.where("centroid").count() == 2
    assert {r.vec_id for r in store1.where("NOT centroid").collect()} == {1, 2}

    # batch 2: an exact copy of 1 (corpus wins), a fresh direction, and
    # a near-copy of the fresh one (batch-internal greedy, lower id wins)
    b2 = spark.createDataFrame(
        [(10, vec(0.0)), (11, vec(3.0)), (12, vec(3.02))],
        "vec_id long, embedding array<float>",
    )
    d2, store2 = D.incremental_semdedup(b2, store1, threshold=0.99, n_clusters=2)
    dec2 = {r.vec_id: r for r in d2.collect()}
    assert not dec2[10].keep and dec2[10].dup_of == 1
    assert dec2[11].keep and dec2[11].dup_of is None
    assert not dec2[12].keep and dec2[12].dup_of == 11
    assert {r.vec_id for r in store2.where("NOT centroid").collect()} == {1, 2, 11}
    # centroids unchanged across batches (pinned quantizer)
    c1 = {r.cell: list(r.embedding) for r in store1.where("centroid").collect()}
    c2 = {r.cell: list(r.embedding) for r in store2.where("centroid").collect()}
    assert c1 == c2

    # store survives the parquet round-trip the handoff uses
    with tempfile.TemporaryDirectory() as tmp:
        D.save_signature_store(store2, f"{tmp}/store")
        loaded = D.load_signature_store(spark, f"{tmp}/store")
        b3 = spark.createDataFrame(
            [(20, vec(0.001)), (21, vec(-1.5))],
            "vec_id long, embedding array<float>",
        )
        d3, store3 = D.incremental_semdedup(b3, loaded, threshold=0.99, n_clusters=2)
        dec3 = {r.vec_id: r for r in d3.collect()}
        assert not dec3[20].keep and dec3[20].dup_of == 1
        assert dec3[21].keep
        assert store3.where("NOT centroid").count() == 4


def test_semdedup_max_cell_rows_guard(spark):
    """r11: the bounded-memory sub-cell guard — exact copies are still
    pruned (content-hash salting puts identical vectors in the same
    sub-cell) and the prune groups by (cell, sub)."""
    import math

    def vec(theta):
        return [float(math.cos(theta)), float(math.sin(theta))]

    rows = [(i, vec(0.1 * i)) for i in range(40)]
    rows += [(100 + i, vec(0.1 * i)) for i in range(40)]  # exact copies
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = D.semdedup(emb, threshold=0.9999, n_clusters=2, max_cell_rows=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__sub" in plan
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 80
    for i in range(40):
        # identical pair: exactly one of (i, 100+i) survives, and the
        # dropped one points at the kept one
        a, b = got[i], got[100 + i]
        assert a.keep and not b.keep and b.dup_of == i
    # cap off -> behavior unchanged vs capped on exact-dup structure
    base = {r.vec_id: r.keep for r in D.semdedup(
        emb, threshold=0.9999, n_clusters=2).collect()}
    assert base == {r: got[r].keep for r in got}

    # incremental variant honors the same guard
    first = emb.where("vec_id < 100")
    batch = emb.where("vec_id >= 100").select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    d1, store = D.incremental_semdedup(
        first, None, threshold=0.9999, n_clusters=2, max_cell_rows=10
    )
    d2, _ = D.incremental_semdedup(
        batch, store, threshold=0.9999, n_clusters=2, max_cell_rows=10
    )
    dec = {r.vec_id: r for r in d2.collect()}
    assert all(not dec[1100 + i].keep for i in range(40))


def test_triangle_counts(spark):
    """r11: degree-ordered node-iterator triangle counting vs a literal
    Python enumeration — directed duplicates, reversals, and self-loops
    in the input must not change the undirected answer."""
    import itertools

    from matcha_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} plus a pendant (4), an isolated-ish pair (5,6),
    # and a path 7-8-9 (node 8: degree 2, ZERO triangles — the case
    # where lcc must be a genuine 0.0, not a NULL from the left join;
    # regression for the bug the sf0.01 oracle caught);
    # noise: duplicates, reversed copies, self-loop
    base = list(itertools.combinations(range(4), 2)) + [
        (3, 4), (5, 6), (7, 8), (8, 9),
    ]
    edges = base + [(b, a) for a, b in base] + [(0, 1), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in triangle_counts(df).collect()}

    # literal enumeration
    und = {frozenset(e) for e in base}
    nodes = {n for e in und for n in e}
    tri = {n: 0 for n in nodes}
    for c in itertools.combinations(sorted(nodes), 3):
        if all(frozenset(p) in und for p in itertools.combinations(c, 2)):
            for n in c:
                tri[n] += 1
    deg = {n: sum(1 for e in und if n in e) for n in nodes}
    assert set(got) == nodes
    for n in nodes:
        assert got[n].degree == deg[n], n
        assert got[n].triangles == tri[n], n
        want_lcc = (
            round(2 * tri[n] / (deg[n] * (deg[n] - 1)), 4) if deg[n] >= 2 else 0.0
        )
        assert got[n].lcc == want_lcc, n


@pytest.mark.parametrize("seed", range(4))
def test_triangle_counts_random_differential(spark, seed):
    import itertools
    import random as _r

    from matcha_spark.operators.graph import triangle_counts

    rng = _r.Random(1180 + seed)
    n = rng.randint(4, 14)
    edges = [
        (rng.randint(0, n), rng.randint(0, n))
        for _ in range(rng.randint(3, 40))
    ]
    und = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = {x for e in und for x in e}
    if not nodes:
        return
    tri = {x: 0 for x in nodes}
    for c in itertools.combinations(sorted(nodes), 3):
        if all(frozenset(p) in und for p in itertools.combinations(c, 2)):
            for x in c:
                tri[x] += 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == tri, f"seed={seed} edges={edges}"


def test_triangle_counts_canonical_guard(spark):
    """r13 advice: canonical=True verifies the ordering/self-loop half
    of the caller's promise in-plan — canonical input returns the same
    answer as the canonicalizing path, and a violating edge (reversed,
    or a self-loop) raises loudly instead of silently inflating
    degrees and wedges."""
    import itertools

    import pytest as _pt
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from matcha_spark.operators.graph import triangle_counts

    base = list(itertools.combinations(range(4), 2)) + [(3, 4), (7, 8), (8, 9)]
    df = spark.createDataFrame(base, "src long, dst long")
    want = {(r.node, r.degree, r.triangles, r.lcc)
            for r in triangle_counts(df).collect()}
    got = {(r.node, r.degree, r.triangles, r.lcc)
           for r in triangle_counts(df, canonical=True).collect()}
    assert got == want
    for bad in ([(2, 1)], [(5, 5)]):
        broken = spark.createDataFrame(base + bad, "src long, dst long")
        with _pt.raises(Exception) as exc:
            triangle_counts(broken, canonical=True).collect()
        assert "violates src < dst" in str(exc.value)


def test_triangle_count_global_exact(spark):
    """r11: p=1 is the exact global count — equals the per-node
    operator's sum/3 (every triangle is counted at all three
    corners) and reports the true canonical edge totals."""
    import itertools

    from matcha_spark.operators.graph import triangle_count_global, triangle_counts

    base = list(itertools.combinations(range(4), 2)) + [
        (3, 4), (5, 6), (7, 8), (8, 9),
    ]
    edges = base + [(b, a) for a, b in base] + [(0, 1), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count_global(df).collect()[0]
    assert row.triangles_est == 4.0  # K4 holds exactly 4 triangles
    assert row.triangles_sampled == 4
    assert row.edges_kept == row.edges_total == len(base)
    assert row.p == 1.0
    per_node = triangle_counts(df).agg(F.sum("triangles")).collect()[0][0]
    assert per_node == 3 * row.triangles_sampled


def test_triangle_count_global_doulion(spark):
    """r11: DOULION sparsified estimate — deterministic per seed
    (hash-threshold sampling, no RNG state), unbiased enough that a
    small seed-average lands near truth on K12 (220 triangles), and
    the kept-edge count reflects the sparsification."""
    import itertools

    from matcha_spark.operators.graph import triangle_count_global

    edges = list(itertools.combinations(range(12), 2))  # K12: 66 edges
    df = spark.createDataFrame(edges, "src long, dst long")
    truth = 220.0  # C(12,3)

    ests = []
    for seed in range(6):
        r1 = triangle_count_global(df, p=0.7, seed=seed).collect()[0]
        r2 = triangle_count_global(df, p=0.7, seed=seed).collect()[0]
        assert r1 == r2, f"seed {seed} not deterministic"
        assert r1.edges_total == 66 and 0 < r1.edges_kept < 66
        assert r1.triangles_est == round(r1.triangles_sampled / 0.7**3, 2)
        ests.append(r1.triangles_est)
    mean = sum(ests) / len(ests)
    assert abs(mean - truth) / truth < 0.25, ests


def _py_coreness(edges):
    """Reference sequential peel."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core = {}
    deg = {n: len(v) for n, v in adj.items()}
    alive = set(adj)
    k = 0
    while alive:
        k_level = min(deg[n] for n in alive)
        k = max(k, k_level)
        peel = [n for n in alive if deg[n] <= k]
        while peel:
            n = peel.pop()
            if n not in alive:
                continue
            core[n] = k
            alive.discard(n)
            for m in adj[n]:
                if m in alive:
                    deg[m] -= 1
                    if deg[m] <= k:
                        peel.append(m)
    return core


def test_coreness_planted(spark):
    """K5 (core 4) bridged to a triangle (core 2) with a pendant chain
    (core 1); directed duplicates and self-loops are noise."""
    import itertools

    from matcha_spark.operators.graph import coreness

    k5 = list(itertools.combinations(range(5), 2))
    tri = [(10, 11), (11, 12), (10, 12)]
    chain = [(4, 10), (12, 20), (20, 21)]
    edges = k5 + tri + chain + [(1, 0), (3, 3)]
    got = {
        r.node: r.core
        for r in coreness(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    want = _py_coreness(edges)
    assert got == want
    assert got[0] == 4 and got[10] == 2 and got[21] == 1


def test_coreness_converges_inside_final_unroll_batch(spark):
    """r12 advice: the unrolled convergence test compares batch-end vs
    batch-start, so a fixpoint reached INSIDE the final batch used to
    raise 'did not converge' where unroll=1 returned the exact result.
    The path graph P8 makes its last change at step 3 and confirms at
    step 4: with max_iter=4, unroll=2's second batch covers steps (3,4)
    and reads changed>0 — the one-step confirmation batch must rescue
    it.  A genuinely unconverged run (max_iter=2) must still raise."""
    from matcha_spark.operators.graph import coreness

    edges = [(i, i + 1) for i in range(7)]  # P8: coreness 1 everywhere
    df = spark.createDataFrame(edges, "src long, dst long")
    # small_cutoff=0 forces the distributed fixpoint — the unroll
    # batching and max_iter safety rail under test live there (the
    # r18 driver-peel tail would otherwise answer without iterating)
    base = {
        r.node: r.core
        for r in coreness(df, max_iter=4, unroll=1, small_cutoff=0).collect()
    }
    assert set(base.values()) == {1} and len(base) == 8
    got = {
        r.node: r.core
        for r in coreness(df, max_iter=4, unroll=2, small_cutoff=0).collect()
    }
    assert got == base
    with pytest.raises(RuntimeError, match="did not converge"):
        coreness(df, max_iter=2, unroll=2, small_cutoff=0)


@pytest.mark.parametrize("seed", range(5))
def test_coreness_random_differential(spark, seed):
    import random as _r

    from matcha_spark.operators.graph import coreness

    rng = _r.Random(2200 + seed)
    n = rng.randint(3, 16)
    edges = [
        (rng.randint(0, n), rng.randint(0, n))
        for _ in range(rng.randint(2, 50))
    ]
    want = _py_coreness(edges)
    if not want:
        return
    got = {
        r.node: r.core
        for r in coreness(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == want, f"seed={seed} edges={edges}"


def test_ann_recall_sound_entries(spark):
    """r12 sound twins: the seeded ANN operators' recall against exact
    cosine top-k clears the entries' floors at sf0.001 too (the driver
    only checks sf0.01; the bounds were chosen >= 0.2 under the
    measured minimum at every shipped SF)."""
    from matcha_spark import suite

    for fn in (
        suite.emb_lsh_recall_sound,
        suite.emb_ivf_recall_sound,
        suite.emb_pq_recall_sound,
    ):
        rows = fn(spark, SF_DIR).collect()
        assert len(rows) == 25
        assert all(r.floor_ok and r.mean_ok for r in rows), fn.__name__


def test_graph_kcore_max_matches_sequential_peel(spark):
    """The graph_kcore_max entry's fixed-k membership equals the
    sequential peel's survivor set at sf0.001 — the same differential
    its DuckDB recursive-CTE oracle runs at sf0.01."""
    from matcha_spark import suite

    got = {(r.k, r.node) for r in suite.graph_kcore_max(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where(
        "l_orderkey % 10 = 0"
    )
    pairs = {
        (min(a, b), max(a, b))
        for a, b in (
            (r.pa, r.pb)
            for r in li.alias("x")
            .join(li.alias("y"), "l_orderkey")
            .selectExpr("x.l_partkey AS pa", "y.l_partkey AS pb")
            .where("pa < pb")
            .collect()
        )
    }
    core = _py_coreness(list(pairs))
    want = {(k, n) for k in (4, 8) for n, c in core.items() if c >= k}
    assert got == want and got


def test_minhash_and_near_lsh_sound_entries(spark):
    """r12: the minhash/near-dup families' organic sound twins hold at
    sf0.001 too — every exact j>=0.5 pair is an LSH candidate, and the
    LSH keep-map refines the exact clustering."""
    from matcha_spark import suite

    rows = suite.doc_minhash_recall_sound(spark, SF_DIR).collect()
    assert rows and all(r.found for r in rows)
    rows = suite.dedup_near_lsh_sound(spark, SF_DIR).collect()
    assert len(rows) == 500 and all(r.sound for r in rows)


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_planted(spark):
    """r14: a long passage planted into several otherwise-distinct
    documents is found as one span per non-first occurrence, covering
    most of the passage (CDC resync settles within one max-size chunk
    of each edge), and the corpus-wide first occurrence is exempt."""
    import random as _r

    from matcha_spark.operators.dedup import duplicate_spans

    rng = _r.Random(41)
    words = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{rng.randint(0, 10**9)}" for _ in range(n)
    )
    # aperiodic shared boilerplate: periodic content is CDC's
    # documented worst case (a periodic gear hash places boundaries
    # either everywhere or nowhere inside the repetition)
    prng = _r.Random(7)
    passage = "LICENSE " + " ".join(
        f"lic{prng.randint(0, 10**9)}" for _ in range(180)
    ) + " "
    rows = [
        (1, words(80, "a") + " " + passage + words(80, "b")),
        (2, words(90, "c") + " " + passage + words(70, "d")),
        (3, words(60, "e") + " " + passage + words(95, "f")),
        (4, words(100, "g")),  # no shared content
    ]
    docs = _span_docs(spark, rows)
    spans = duplicate_spans(docs, avg_size=32, min_span_bytes=64)
    by_doc = {}
    for r in spans.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # first occurrence (doc 1) exempt; docs 2 and 3 flagged; doc 4 clean
    assert 1 not in by_doc and 4 not in by_doc
    assert set(by_doc) == {2, 3}
    hi = 32 * 8  # cdc max_chunk_size default = avg * 8
    for d in (2, 3):
        total = sum(r.span_bytes for r in by_doc[d])
        assert total >= len(passage) - 2 * hi, (d, total)
        # spans stay inside the document and are disjoint
        b = rows[d - 1][1].encode()
        ivs = sorted((r.span_start, r.span_start + r.span_bytes)
                     for r in by_doc[d])
        assert all(0 <= s < e <= len(b) for s, e in ivs)
        assert all(p[1] <= q[0] for p, q in zip(ivs, ivs[1:]))
        # the span really is the planted passage, not random text
        for s_, e_ in ivs:
            assert b"lic" in b[s_:e_]


def test_duplicate_spans_keep_first_off(spark):
    from matcha_spark.operators.dedup import duplicate_spans

    prng = __import__("random").Random(9)
    passage = " ".join(f"sh{prng.randint(0, 10**9)}" for _ in range(150))
    docs = _span_docs(
        spark,
        [(1, "intro one " + passage), (2, "intro two two " + passage)],
    )
    spans = duplicate_spans(docs, avg_size=32, keep_first=False,
                            min_span_bytes=64)
    assert {r.doc_id for r in spans.collect()} == {1, 2}


def test_scrub_duplicate_spans_roundtrip(spark):
    """Scrub removes exactly the flagged bytes (ASCII: no snapping),
    keeps non-text columns and untouched docs, and the scrubbed corpus
    retains ONE copy of the passage."""
    from pyspark.sql import functions as F

    from matcha_spark.operators.dedup import (
        duplicate_spans,
        scrub_duplicate_spans,
    )

    prng = __import__("random").Random(11)
    passage = ("BOILERMARK " + " ".join(
        f"bp{prng.randint(0, 10**9)}" for _ in range(160)) + " ")
    rows = [
        (1, "alpha beta gamma " + passage + "delta one"),
        (2, "epsilon zeta " + passage + "eta two two"),
        (3, "plain document with nothing shared at all"),
    ]
    docs = _span_docs(spark, rows).withColumn(
        "lang", F.lit("en")
    )
    spans = duplicate_spans(docs, avg_size=32, min_span_bytes=64)
    got = {r.doc_id: r for r in
           scrub_duplicate_spans(docs, spans).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3].text == rows[2][1] and got[3].lang == "en"
    cut = {r.doc_id: r.span_bytes for r in
           spans.groupBy("doc_id").agg(
               F.sum("span_bytes").alias("span_bytes")).collect()}
    total_kept = sum(len(r.text.encode()) for r in got.values())
    total_orig = sum(len(t.encode()) for _, t in rows)
    assert total_kept == total_orig - sum(cut.values())
    core = passage[len(passage) // 3 : 2 * len(passage) // 3]
    n_copies = sum(core in r.text for r in got.values())
    assert n_copies == 1  # cut-all-but-one


def test_scrub_duplicate_spans_utf8_snap(spark):
    """A span edge landing inside a multi-byte sequence is snapped so
    the output is valid UTF-8 (decode would raise otherwise) and the
    kept text is a subsequence of the original."""
    from matcha_spark.operators.dedup import scrub_duplicate_spans

    text = "é" * 50  # 100 bytes, every odd offset mid-character
    docs = _span_docs(spark, [(1, text)])
    spans = spark.createDataFrame(
        [(1, 33, 33)], "doc_id long, span_start long, span_bytes long"
    )
    out = scrub_duplicate_spans(docs, spans).collect()[0].text
    assert set(out) <= {"é"} and 0 < len(out) < 50


@pytest.mark.parametrize("seed", range(60, 66))
def test_scrub_duplicate_spans_property_fuzz(spark, seed):
    """Property fuzz for the scrub kernel over random multibyte text
    and random (possibly touching) spans: output always decodes as
    valid UTF-8, every byte the spans didn't cover survives in order,
    and the removal is at least the requested bytes (snapping only
    grows it, by < 4 bytes per edge)."""
    import random as _r

    from matcha_spark.operators.dedup import scrub_duplicate_spans

    rng = _r.Random(4200 + seed)
    alphabet = "ab α β 語 🚀 é ñ\n"
    rows, span_rows, expect_min_cut = [], [], {}
    for doc in range(6):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 300)))
        rows.append((doc, text))
        b = text.encode("utf-8")
        cuts = []
        pos = 0
        while pos < len(b) and len(cuts) < 4 and rng.random() < 0.8:
            s = rng.randint(pos, len(b) - 1)
            ln = rng.randint(1, max(1, (len(b) - s) // 2))
            cuts.append((s, ln))
            pos = s + ln
        for s, ln in cuts:
            span_rows.append((doc, s, ln))
        expect_min_cut[doc] = sum(ln for _, ln in cuts)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = spark.createDataFrame(
        span_rows or [(99, 0, 1)],
        "doc_id long, span_start long, span_bytes long",
    )
    got = {r.doc_id: r.text for r in
           scrub_duplicate_spans(docs, spans).collect()}
    assert set(got) == set(dict(rows))

    def snap_back(b, i):
        while 0 < i < len(b) and (b[i] & 0xC0) == 0x80:
            i -= 1
        return i

    def snap_fwd(b, i):
        while i < len(b) and (b[i] & 0xC0) == 0x80:
            i += 1
        return i

    for doc, text in rows:
        out = got[doc]
        b = text.encode("utf-8")
        kept, pos = [], 0
        for d, st0, ln in sorted(s for s in span_rows if s[0] == doc):
            st, en = snap_back(b, st0), snap_fwd(b, st0 + ln)
            if st > pos:
                kept.append(b[pos:st])
            pos = max(pos, en)
        kept.append(b[pos:])
        want = b"".join(kept).decode("utf-8")
        assert out == want, (seed, doc)
        assert len(out.encode()) <= max(len(b) - expect_min_cut[doc], 0) \
            or expect_min_cut[doc] == 0


def test_capped_arms_drop_semantics(spark):
    """r17 (verdict ask #5): what the binding caps DROP, pinned on
    corpora built to saturate them — the other half of the suite
    entries' cap_sound iff (the oracle checks the survive half on the
    shipped corpora, where every planted pair keeps under-cap
    evidence).

    - embedding ``max_bucket_size``: N identical vectors collapse
      every sign bucket to one N-member bucket, so a cap < N drops ALL
      their pairs; a cap >= N restores every pair.
    - audio ``max_fp_windows``: M identical clips make each window fp
      M-hot, so a cap < M prunes all shared evidence; a cap >= M
      restores the pairs."""
    import numpy as np

    from matcha_spark.operators.dedup import embedding_dup_pairs_lsh
    from matcha_spark.operators.multimodal import audio_near_dup_pairs

    rng = np.random.default_rng(11)
    v = rng.normal(0, 1, 64)
    v /= np.linalg.norm(v)
    w = rng.normal(0, 1, 64)
    w /= np.linalg.norm(w)
    rows = [(i, [float(x) for x in v]) for i in range(12)]
    rows.append((50, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_pairs = 12 * 11 // 2
    uncapped = embedding_dup_pairs_lsh(emb, threshold=0.99)
    assert uncapped.count() == n_pairs
    dropped = embedding_dup_pairs_lsh(emb, threshold=0.99, max_bucket_size=8)
    assert dropped.count() == 0            # mega-bucket (12 > 8) pruned whole
    kept = embedding_dup_pairs_lsh(emb, threshold=0.99, max_bucket_size=16)
    assert kept.count() == n_pairs

    def raw_decode(payload: bytes) -> np.ndarray:
        return (
            np.frombuffer(payload, dtype=np.uint8).astype(np.float64) / 128.0
            - 1.0
        )

    clip = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    media = spark.createDataFrame(
        [(i, "audio", bytearray(clip)) for i in range(9)],
        "media_id long, kind string, payload binary",
    )
    m_pairs = 9 * 8 // 2
    assert audio_near_dup_pairs(media, decoder=raw_decode).count() == m_pairs
    assert (
        audio_near_dup_pairs(media, decoder=raw_decode, max_fp_windows=8)
        .count() == 0                      # every fp 9-hot under cap 8
    )
    assert (
        audio_near_dup_pairs(media, decoder=raw_decode, max_fp_windows=16)
        .count() == m_pairs
    )


def test_bloom_merge_and_persist(spark):
    """r18: incremental decontamination — merging two bit tables built
    with identical parameters equals the table built from the unioned
    probe sets BIT FOR BIT (bit_or is associative/commutative and
    insertion is idempotent, so the union is exact, not approximate);
    parameter mismatches fail loudly; a save/load round-trip feeds
    bloom_contamination unchanged."""
    import os
    import shutil
    import tempfile

    import pytest as _pytest

    from matcha_spark.operators.text import (
        bloom_contamination,
        load_bloom_bits,
        merge_bloom_bits,
        ngram_bloom_bits,
        save_bloom_bits,
    )

    p1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "pid long, text string",
    )
    p2 = spark.createDataFrame(
        [(3, "iota kappa lambda mu"), (4, "alpha beta gamma delta")],
        "pid long, text string",
    )
    kw = dict(n=2, num_bits=4096, num_hashes=5, seed=42)
    b1 = ngram_bloom_bits(p1, **kw)
    b2 = ngram_bloom_bits(p2, **kw)
    merged = merge_bloom_bits(b1, b2)
    union = ngram_bloom_bits(p1.unionByName(p2), **kw)
    got = {(r.word_idx, r.bits) for r in merged["bits"].collect()}
    want = {(r.word_idx, r.bits) for r in union["bits"].collect()}
    assert got == want and len(want) > 0          # bit-exact union

    for key, val in [("num_bits", 8192), ("num_hashes", 4),
                     ("n", 3), ("seed", 7)]:
        bad = ngram_bloom_bits(p2, **{**kw, key: val})
        with _pytest.raises(ValueError, match=key):
            merge_bloom_bits(b1, bad)

    base = tempfile.mkdtemp(prefix="mbloom_")
    path = os.path.join(base, "bloom")
    save_bloom_bits(merged, path)
    loaded = load_bloom_bits(spark, path)
    assert {k: loaded[k] for k in ("num_bits", "num_hashes", "n", "seed")} \
        == {k: merged[k] for k in ("num_bits", "num_hashes", "n", "seed")}
    docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta trailing"),
         (11, "totally unrelated clean words here")],
        "doc_id long, text string",
    )
    via_loaded = {(r.doc_id, r.contaminated_grams)
                  for r in bloom_contamination(docs, loaded).collect()}
    via_merged = {(r.doc_id, r.contaminated_grams)
                  for r in bloom_contamination(docs, merged).collect()}
    assert via_loaded == via_merged
    leaked = dict(via_loaded)
    assert leaked[10] >= 3                         # planted span flagged
    shutil.rmtree(base, ignore_errors=True)


def test_bloom_num_hashes_validation(spark):
    """r18 advice #4: ``num_hashes < 1`` would build an EMPTY bit
    table and silently flag zero grams — violating the documented
    no-false-negative guarantee; it must fail loudly like the fpp
    check does."""
    import pytest as _pytest

    from matcha_spark.operators.text import ngram_bloom_bits

    probes = spark.createDataFrame(
        [(1, "a b c d")], "pid long, text string"
    )
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="num_hashes"):
            ngram_bloom_bits(probes, n=2, num_hashes=bad)


def test_bloom_contamination_superset(spark):
    """r17: the Bloom decontamination path (the 100-TB probe-set
    shape).  Contract vs the exact operator on the identical gram
    stream: SUPERSET — every exactly-contaminated gram position is
    flagged (no false negatives, by construction), per-doc position
    counts agree, and on a disjoint clean corpus the deterministic
    false-positive rate stays within a few multiples of the configured
    fpp.  The bit table auto-sizes from the measured distinct-gram
    count and never needs a driver-side array."""
    import numpy as np

    from matcha_spark.operators.text import (
        benchmark_contamination,
        bloom_contamination,
        ngram_bloom_bits,
    )

    rng = np.random.default_rng(3)
    probe_rows = [
        (i, " ".join(f"bench{rng.integers(0, 400)}" for _ in range(12)))
        for i in range(40)
    ]
    probes = spark.createDataFrame(probe_rows, "pid long, text string")
    # corpus: 10 leaked docs embedding a probe span, 200 clean docs
    # over a DISJOINT vocabulary, one too-short doc
    leaked = [
        (i, "clean lead in words " + probe_rows[i][1] + " trailing words")
        for i in range(10)
    ]
    clean = [
        (100 + i, " ".join(f"web{rng.integers(0, 4000)}" for _ in range(25)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(
        leaked + clean + [(999, "too short")], "doc_id long, text string"
    )

    exact = {r.doc_id: r for r in benchmark_contamination(
        docs, probes, n=3).collect()}
    bloom = ngram_bloom_bits(probes, n=3, fpp=0.01)
    assert bloom["num_bits"] % 64 == 0 and bloom["num_bits"] >= 64
    got = {r.doc_id: r for r in bloom_contamination(docs, bloom).collect()}

    assert set(got) == set(exact)
    fp_grams = fp_total = 0
    for d, e in exact.items():
        g = got[d]
        assert g.n_grams == e.n_grams                       # same stream
        assert g.contaminated_grams >= e.contaminated_grams  # superset
        if e.contamination > 0:
            assert g.contamination > 0                       # no misses
        if d >= 100:                                         # clean docs
            fp_grams += g.contaminated_grams
            fp_total += g.n_grams
    assert exact[0].contamination > 0                        # fixture sanity
    assert got[999].n_grams == 0 and got[999].contamination == 0.0
    # deterministic fp rate near the configured 1% (binomial slack)
    assert fp_total > 3000 and fp_grams / fp_total < 0.05, (
        fp_grams, fp_total
    )

    # a tighter fpp flags strictly fewer-or-equal clean grams
    tight = ngram_bloom_bits(probes, n=3, fpp=0.0001)
    got2 = {r.doc_id: r for r in bloom_contamination(docs, tight).collect()}
    fp2 = sum(got2[d].contaminated_grams for d in got2 if d >= 100)
    assert fp2 <= fp_grams
    for i in range(10):                                      # recall intact
        assert got2[i].contaminated_grams >= exact[i].contaminated_grams


def test_token_classifier_nb(spark):
    """r17: the distributed Naive-Bayes classifier filter (the
    CCNet/FineWeb-Edu classifier-gating shape).  Pins: separable
    synthetic classes classify perfectly with positive margins; the
    per-doc scores match an independent numpy NB (same Laplace
    formula) to float tolerance; all-unseen-token docs and token-less
    docs fall back deterministically (smoothed defaults / prior
    argmax, ties toward the smallest class); single-class models give
    NULL margins."""
    import math

    import numpy as np

    from matcha_spark.operators.text import (
        classify_tokens,
        train_token_classifier,
    )

    rng = np.random.default_rng(9)
    good_v = [f"edu{i}" for i in range(30)]
    spam_v = [f"ad{i}" for i in range(30)]
    mk = lambda v, n: " ".join(rng.choice(v) for _ in range(n))
    train = [(i, "good", mk(good_v, 30)) for i in range(40)] + [
        (100 + i, "spam", mk(spam_v, 30)) for i in range(60)
    ]
    examples = spark.createDataFrame(
        train, "doc_id long, label string, text string"
    )
    model = train_token_classifier(examples)
    assert model["vocab"] == 60

    probes = [
        (1, mk(good_v, 20)),
        (2, mk(spam_v, 20)),
        (3, mk(good_v, 12) + " " + mk(spam_v, 3)),   # mixed, good-heavy
        (4, "zzz unseen tokens only here"),            # all unseen
        (5, ""),                                       # token-less
    ]
    docs = spark.createDataFrame(probes, "doc_id long, text string")
    got = {r.doc_id: r for r in classify_tokens(docs, model).collect()}
    assert got[1].pred == "good" and got[1].margin > 0
    assert got[2].pred == "spam" and got[2].margin > 0
    assert got[3].pred == "good"
    # all-unseen: identical per-token defaults differ only via class
    # totals; token-less: prior argmax (spam has the larger prior)
    assert got[5].pred == "spam"
    assert got[5].margin == round(math.log(60 / 40), 4)

    # numpy parity on the margin of a mixed doc
    cc = {(r["class"], r.tok): r.c for r in spark.createDataFrame(
        train, "doc_id long, label string, text string"
    ).selectExpr("label as class", "explode(split(lower(trim(text)), '\\\\s+')) as tok")
     .groupBy("class", "tok").count().withColumnRenamed("count", "c").collect()}
    totals = {}
    for (c, t), n in cc.items():
        totals[c] = totals.get(c, 0) + n
    V, a = 60, 1.0
    pri = {"good": math.log(40 / 100), "spam": math.log(60 / 100)}

    def np_score(text, c):
        s = pri[c]
        for t in text.lower().split():
            s += math.log((cc.get((c, t), 0) + a) / (totals[c] + a * V))
        return s

    for d, text in probes[:4]:
        sc = sorted(
            ((-np_score(text, c), c) for c in ("good", "spam"))
        )
        assert got[d].pred == sc[0][1], d
        want_margin = round(sc[1][0] - sc[0][0], 4)
        assert abs(got[d].margin - want_margin) < 2e-4, (d, got[d].margin, want_margin)

    # single-class model: margin NULL, pred that class
    one = train_token_classifier(
        spark.createDataFrame(
            [(0, "x", "alpha beta")], "doc_id long, label string, text string"
        )
    )
    g1 = classify_tokens(docs, one).collect()
    assert all(r.pred == "x" and r.margin is None for r in g1)


def test_coreness_driver_peel_matches_distributed(spark):
    """r18 driver tail: the small-graph driver peel must equal the
    distributed h-index fixpoint (small_cutoff=0) in values AND schema
    on planted-core and string-keyed graphs."""
    import itertools

    from matcha_spark.operators.graph import coreness

    k5 = list(itertools.combinations(range(5), 2))
    edges = k5 + [(10, 11), (11, 12), (10, 12), (4, 10), (12, 20),
                  (20, 21), (1, 0), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    drv, dist = coreness(df), coreness(df, small_cutoff=0)
    assert drv.schema == dist.schema
    assert sorted(map(tuple, drv.collect())) == sorted(
        map(tuple, dist.collect())
    )
    sdf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    sd, ss = coreness(sdf), coreness(sdf, small_cutoff=0)
    assert sd.schema == ss.schema
    assert sorted(map(tuple, sd.collect())) == sorted(map(tuple, ss.collect()))


@pytest.mark.parametrize("seed", range(5))
def test_incremental_simhash_driver_tail_matches_distributed(spark, seed):
    """r18 driver tail: the numpy banded-pairing/keeper kernel must
    equal the distributed contraction (small_cutoff=0) row-for-row —
    decisions AND updated store, schema included — across random
    two-batch corpora with NULL texts (zero sigs), near-dup planted
    copies, string ids, and the r15 rank (keep-best) seam."""
    import random as _r

    rng = _r.Random(7300 + seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    as_str = seed == 4

    def mk(i):
        ident = f"d{i:03d}" if as_str else i
        if rng.random() < 0.15:
            return (ident, None)
        base = " ".join(rng.choice(words) for _ in range(rng.randint(3, 9)))
        return (ident, base)

    n = rng.randint(10, 30)
    rows = [mk(i) for i in range(n)]
    # planted near-copies drive multi-member clusters
    for j in range(rng.randint(1, 4)):
        src = rng.choice([r for r in rows if r[1]] or rows)
        ident = f"d{n + j:03d}" if as_str else n + j
        rows.append((ident, src[1]))
    idt = "string" if as_str else "long"
    docs = spark.createDataFrame(rows, f"doc_id {idt}, text string")
    half = rows[len(rows) // 2][0]
    first = docs.where(F.col("doc_id") < half)
    batch = docs.where(F.col("doc_id") >= half)
    rank = F.length("text") if seed % 2 else None
    outs = []
    for cutoff in (200_000, 0):
        _, sigs = D.incremental_dedup_simhash(
            first, None, max_hamming=8, small_cutoff=cutoff
        )
        dec, upd = D.incremental_dedup_simhash(
            batch, sigs, max_hamming=8, small_cutoff=cutoff, rank=rank
        )
        outs.append((dec.schema, sorted(map(tuple, dec.collect())),
                     sorted(map(tuple, upd.collect()))))
    assert outs[0] == outs[1], f"seed={seed}\nrows={rows}"


def test_incremental_simhash_pair_budget_falls_back():
    """The driver kernel refuses pathological bucket occupancy: a tiny
    pair budget returns None (caller then runs the distributed arm)."""
    # DISTINCT sigs differing only in the low band: the other 8 band
    # buckets each hold all 64 sigs (the pairing runs over distinct
    # signatures — identical-sig groups collapse before any budget)
    rows = [(i, 16 + (i % 8), True) for i in range(64)]
    assert D._driver_simhash_decisions(rows, 8, pair_budget=10) is None
    out = D._driver_simhash_decisions(rows, 8)
    # all within hamming 8 of each other: one cluster keeping id 0
    assert sorted(out) == [(i, i == 0, None if i == 0 else 0)
                           for i in range(64)]
