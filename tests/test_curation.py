"""Corpus-curation operators: deterministic sampling, stratified caps,
TF-IDF, BM25."""

import pytest
from pyspark.sql import functions as F

from matcha_spark.operators.text import (
    bm25_search,
    rate_threshold_hex,
    sample_hash,
    stratified_sample,
    tfidf_top_terms,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from matcha_spark.sources.tpch_graph import load_tables

    return load_tables(spark, SF_DIR, "documents")["documents"]


def test_sample_hash_deterministic_and_partition_invariant(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in sample_hash(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in sample_hash(docs.repartition(7), 0.3).select("doc_id").collect()}
    assert a == b and a  # same keys regardless of physical layout
    # df.sample by contrast is layout-dependent; that's the point of md5


def test_sample_hash_rate_roughly_holds(spark):
    docs = _docs(spark)
    n = docs.count()
    got = sample_hash(docs, 0.5).count()
    assert abs(got / n - 0.5) < 0.2  # uniform md5 draw, small-n tolerance


def test_sample_hash_salt_changes_sample(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in sample_hash(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in sample_hash(docs, 0.3, salt="v2").select("doc_id").collect()}
    assert a != b


def test_rate_threshold_hex_bounds():
    assert rate_threshold_hex(0.0) == "0" * 32
    assert rate_threshold_hex(0.25) == "4" + "0" * 31
    assert rate_threshold_hex(1.0) > "f" * 32  # everything passes


def test_stratified_sample_caps_each_group(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, per_group=3, group_col="source")
    per = out.groupBy("source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    # deterministic: same keys on re-run
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in stratified_sample(docs.repartition(5), per_group=3, group_col="source")
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_stratified_sample_keeps_small_groups_whole(spark):
    docs = _docs(spark)
    sizes = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    out = stratified_sample(docs, per_group=10_000, group_col="source")
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got == sizes  # cap above group size = identity


def test_tfidf_rare_term_outranks_common(spark):
    rows = [
        (1, "apple apple apple zebra"),
        (2, "apple banana banana"),
        (3, "apple cherry"),
        (4, "apple dates"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(docs, k=2)
    top1 = {r.doc_id: r.term for r in out.where("rk = 1").collect()}
    # doc 1: apple tf=3 beats zebra tf=1 on the integer-first ranking
    assert top1[1] == "apple"
    # doc 2: banana tf=2 beats apple (tf=1, and apple is in every doc)
    assert top1[2] == "banana"
    # ubiquitous 'apple' scores lowest idf: its tfidf in doc 3 < cherry's
    d3 = {r.term: r.tfidf for r in out.where("doc_id = 3").collect()}
    assert d3["cherry"] > d3["apple"]


def test_tfidf_k_bound(spark):
    docs = _docs(spark)
    out = tfidf_top_terms(docs, k=3)
    per = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 3 for r in per)
    assert out.where("rk > 3").count() == 0


def test_bm25_finds_term_heavy_docs(spark):
    rows = [
        (1, "spark spark spark engine"),
        (2, "spark engine"),
        (3, "pandas only here"),
        (4, "nothing relevant"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(docs, ["spark"], k=2).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_multi_term_accumulates(spark):
    rows = [
        (1, "alpha beta"),
        (2, "alpha alpha"),
        (3, "beta gamma delta epsilon zeta eta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bm25 for r in bm25_search(docs, ["alpha", "beta"], k=3).collect()}
    # doc 1 matches both query terms; doc 3's beta is diluted by length
    assert out[1] > out[3]
    assert set(out) == {1, 2, 3}


def test_bm25_no_matches_empty(spark):
    docs = _docs(spark)
    assert bm25_search(docs, ["zzzzqqqq"], k=5).count() == 0


def test_repetition_signals_planted(spark):
    from matcha_spark.operators.text import repetition_signals

    rows = [
        (1, "Buy now!\nGreat deal\nBuy now!\nbuy NOW!\nunique line"),  # 3/5 dup
        (2, "spam spam spam spam eggs"),  # 'spam spam' dominates bigrams
        (3, "all distinct lines\nhere"),
        (4, "one"),  # no bigrams, one line
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    # doc 1: 5 non-empty lines, normalized dups: 'buy now!' x3 -> 1 - 3/5
    assert out[1].n_lines == 5 and out[1].dup_line_frac == 0.4
    assert out[3].dup_line_frac == 0.0
    # doc 2 bigrams: (spam spam) x3, (spam eggs) x1 -> 0.75
    assert out[2].top_bigram == "spam spam" and out[2].top_bigram_frac == 0.75
    # no bigrams -> frac 0.0, NULL bigram
    assert out[4].top_bigram is None and out[4].top_bigram_frac == 0.0


def test_corpus_sketch_stats_within_tolerance(spark):
    """HLL distinct and GK quantiles must land near the exact twin —
    the contract that lets the sketch replace the exact pass at scale."""
    from matcha_spark.operators.text import corpus_sketch_stats
    from matcha_spark.operators.text import corpus_stats

    docs = _docs(spark)
    sk = corpus_sketch_stats(docs).collect()[0]
    ex = corpus_stats(docs).collect()[0]
    assert sk.n_docs == ex.n_docs
    assert abs(sk.approx_unique_docs - ex.n_unique_docs) / ex.n_unique_docs < 0.05
    # quantiles: monotone and inside the observed token-count range
    toks = [r[0] for r in docs.selectExpr("size(split(trim(text), '\\\\s+'))").collect()]
    assert min(toks) <= sk.p50_tokens <= sk.p90_tokens <= sk.p99_tokens <= max(toks)


def test_sketch_quantile_rank_error_bound(spark):
    """Make the GK sketch's contract explicit: percentile_approx with
    accuracy A guarantees rank error <= n/A, so each reported quantile
    must be an order statistic within that rank window of the exact
    distribution (not just 'inside the min/max range')."""
    import math

    from matcha_spark.operators.text import corpus_sketch_stats

    docs = _docs(spark)
    sk = corpus_sketch_stats(docs).collect()[0]
    toks = sorted(
        r[0] for r in docs.selectExpr("size(split(trim(text), '\\\\s+'))").collect()
    )
    n, eps = len(toks), 1.0 / 10_000  # operator's accuracy parameter
    for q, val in ((0.5, sk.p50_tokens), (0.9, sk.p90_tokens), (0.99, sk.p99_tokens)):
        lo = toks[max(0, math.floor((q - eps) * n) - 1)]
        hi = toks[min(n - 1, math.ceil((q + eps) * n))]
        assert lo <= val <= hi, f"q={q}: {val} outside rank window [{lo}, {hi}]"
        assert val in toks  # GK returns a genuine observed value


def test_cdc_chunks_partition_and_resync(spark):
    """CDC invariants: chunks exactly partition each document's UTF-8
    bytes within [min,max] size bounds, and an edit near the start of a
    document leaves later chunk hashes unchanged (boundary resync — the
    property fixed-size blocking lacks)."""
    import numpy as np

    from matcha_spark.operators.text import cdc_chunks

    rng = np.random.default_rng(3)
    base = " ".join(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=5)) for _ in range(400)
    )
    docs = spark.createDataFrame(
        [(1, base), (2, "PREFIX EDIT " + base), (3, "short"), (4, "")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs, avg_size=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, text in [(1, base), (2, "PREFIX EDIT " + base), (3, "short")]:
        chunks = sorted(by_doc[did], key=lambda r: r.chunk_idx)
        data = text.encode("utf-8")
        assert chunks[0].start == 0
        assert sum(c.length for c in chunks) == len(data)
        for a, b in zip(chunks, chunks[1:]):
            assert a.start + a.length == b.start  # contiguous
        assert all(c.length <= 64 * 8 for c in chunks)
        assert all(
            c.length >= 64 // 4 for c in chunks[:-1]
        ) or len(chunks) == 1  # only the tail may undershoot min
    assert 4 not in by_doc  # empty doc -> no chunks
    # resync: doc2 = doc1 with a 12-byte prefix edit; most chunk hashes shared
    h1 = {c.chunk_hash for c in by_doc[1]}
    h2 = {c.chunk_hash for c in by_doc[2]}
    assert len(h1 & h2) >= int(0.7 * len(h1)), (len(h1 & h2), len(h1))
    # determinism
    again = {(r.doc_id, r.chunk_idx, r.start, r.length, r.chunk_hash)
             for r in cdc_chunks(docs, avg_size=64).collect()}
    assert again == {(r.doc_id, r.chunk_idx, r.start, r.length, r.chunk_hash)
                     for r in rows}


def test_dedup_paragraphs_semantics(spark):
    """Corpus-wide paragraph dedup: canonical first occurrence (least
    (doc_id, idx)) survives, later repeats vanish — across AND within
    documents; short/empty paragraphs are structural and never dedup;
    a corpus without repeats round-trips byte-identically."""
    from matcha_spark.operators.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared para\n\ngamma"),
            (2, "shared para\n\ndelta\n\nshared para"),  # cross- and self-dup
            (3, "unique one\n\n\n\nunique two"),  # empty para preserved
            (4, ""),  # empty doc
            (5, None),  # null text
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert out[1].text == "alpha beta\n\nshared para\n\ngamma"  # canonical stays
    assert out[1].n_paras == 3 and out[1].n_kept == 3
    assert out[2].text == "delta"  # both repeats of the shared para dropped
    assert out[2].n_paras == 3 and out[2].n_kept == 1
    assert out[3].text == "unique one\n\n\n\nunique two"  # round-trip w/ empty
    assert out[3].n_paras == 3 and out[3].n_kept == 3
    assert out[4].text == "" and out[4].n_paras == 1 and out[4].n_kept == 1
    assert out[5].text == "" and out[5].n_paras == 1
    # hash_paras=False (text shuffle key) computes the identical result
    plain = {r.doc_id: r.text for r in dedup_paragraphs(docs, hash_paras=False).collect()}
    assert plain == {k: v.text for k, v in out.items()}
    # min_chars: raise the floor and the short 'delta' para stops being
    # a dedup candidate but long repeats still collapse
    out2 = {r.doc_id: r for r in dedup_paragraphs(docs, min_chars=6).collect()}
    assert out2[2].text == "delta"  # shared para (11 chars) still deduped


def test_dsir_importance_ranks_target_like_docs(spark):
    """DSIR sanity: documents whose n-grams match the target slice's
    vocabulary score strictly higher than off-distribution documents,
    and empty docs score 0."""
    from pyspark.sql import functions as F

    from matcha_spark.operators.text import dsir_importance

    rows = [
        (0, "cat purr cat whisker purr cat"),  # target
        (1, "cat whisker purr purr cat nap"),  # target
        (2, "cat purr whisker nap cat"),  # cat-like, NOT target
        (3, "dog bark fetch bone dog growl"),  # off-distribution
        (4, ""),  # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dsir_importance(docs, target=F.col("doc_id") < 2).collect()
    }
    assert out[2].logw > out[3].logw  # cat doc beats dog doc
    assert out[4].logw == 0.0 and out[4].n_feats == 0
    # n_feats = unigrams + bigrams
    assert out[0].n_feats == 6 + 5
    # per-doc weight scales with per-feature counts: repeating the
    # cat-like doc's text doubles (within rounding) its log weight
    docs2 = spark.createDataFrame(
        rows + [(5, rows[2][1] + " " + rows[2][1])], "doc_id long, text string"
    )
    out2 = {
        r.doc_id: r
        for r in dsir_importance(docs2, target=F.col("doc_id") < 2).collect()
    }
    assert out2[5].logw != 0.0


def test_dsir_importance_one_token_doc(spark):
    """Regression (r09 advice): a 1-token document must not crash the
    bigram expr (sequence(1, 0) steps BACKWARD in Spark, and
    slice(_, 0, 2) then throws) — it contributes its unigram only,
    matching the DuckDB twin's empty range(len - 1)."""
    from pyspark.sql import functions as F

    from matcha_spark.operators.text import dsir_importance

    docs = spark.createDataFrame(
        [(0, "solo"), (1, "cat purr cat"), (2, "  word  ")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dsir_importance(docs, target=F.col("doc_id") == 1).collect()
    }
    assert out[0].n_feats == 1  # one unigram, zero bigrams
    assert out[2].n_feats == 1  # whitespace-padded single token too
    assert out[1].n_feats == 3 + 2


def test_token_windows_packing(spark):
    """Window starts at every stride-th token, covers up to `size`
    tokens, tails shorten, empty docs vanish, and the non-overlapping
    default exactly partitions the token stream."""
    from matcha_spark.operators.text import token_windows

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = [
        (r.doc_id, r.win_idx, r.n_tokens, r.text)
        for r in token_windows(docs, size=3, stride=2)
        .orderBy("doc_id", "win_idx")
        .collect()
    ]
    assert out == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "c d e"),
        (1, 2, 3, "e f g"),
        (1, 3, 1, "g"),
        (2, 0, 2, "x y"),
    ]
    # default stride=size: windows partition the tokens exactly
    flat = (
        token_windows(docs, size=3).orderBy("doc_id", "win_idx").collect()
    )
    doc1 = " ".join(r.text for r in flat if r.doc_id == 1)
    assert doc1 == "a b c d e f g"
    with pytest.raises(ValueError):
        token_windows(docs, size=0)


def test_cdc_boundary_uses_full_window(spark):
    """The boundary test reads the HIGH bits of the rolling hash, so
    every byte of the 16-byte window influences the cut decision — a
    low-bit test would let only the last log2(avg)=6 bytes matter
    (bytes shifted left by >= 6 can't reach the low 6 bits).  Pin it:
    flipping the OLDEST byte of some boundary's window must be able to
    move that boundary."""
    import numpy as np

    from matcha_spark.operators.text import cdc_chunks

    window = 16
    rng = np.random.default_rng(11)
    moved = 0
    trials = []
    for i in range(40):
        base = "".join(chr(97 + c) for c in rng.integers(0, 26, size=600))
        trials.append((i, base))
    docs = spark.createDataFrame(trials, "doc_id long, text string")
    first_cut = {
        r.doc_id: r.length
        for r in cdc_chunks(docs, avg_size=64).collect()
        if r.chunk_idx == 0
    }
    # flip the oldest in-window byte of each doc's first boundary
    mutated = []
    for i, base in trials:
        cut = first_cut[i]
        if cut >= window and cut < len(base):
            pos = cut - window  # oldest byte the boundary's window saw
            flipped = chr(97 + (ord(base[pos]) - 97 + 13) % 26)
            mutated.append((i, base[:pos] + flipped + base[pos + 1 :]))
    assert mutated, "no eligible boundaries in the fixture"
    docs2 = spark.createDataFrame(mutated, "doc_id long, text string")
    cut2 = {
        r.doc_id: r.length
        for r in cdc_chunks(docs2, avg_size=64).collect()
        if r.chunk_idx == 0
    }
    moved = sum(1 for i, _ in mutated if cut2[i] != first_cut[i])
    # with high-bit testing a window-edge flip usually destroys the
    # boundary (P(keep) ~= 1/64); with the low-bit bug it NEVER moves
    assert moved >= len(mutated) // 2, (moved, len(mutated))


def test_cdc_chunks_dedup_composition(spark):
    """cdc_chunks → groupBy(chunk_hash) is chunk-level exact dedup: two
    docs sharing a long run of text share chunk hashes in the middle of
    that run even when their surroundings differ."""
    from pyspark.sql import functions as F

    from matcha_spark.operators.text import cdc_chunks

    import numpy as np

    # non-periodic shared run: perfectly periodic text can legitimately
    # contain zero content-defined cut points (only |period| distinct
    # hash windows exist), in which case only position-dependent forced
    # cuts fire and no alignment is possible — the documented CDC
    # behavior, not a bug
    rng = np.random.default_rng(9)
    shared = " ".join(
        "".join(chr(97 + c) for c in rng.integers(0, 26, size=6)) for _ in range(300)
    )
    docs = spark.createDataFrame(
        [(1, "intro A " + shared + " outro A"), (2, "different intro " + shared)],
        "doc_id long, text string",
    )
    chunks = cdc_chunks(docs, avg_size=64)
    dup = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .count()
    )
    assert dup >= 1  # shared run recognized across documents


def test_benchmark_contamination_planted(spark):
    from matcha_spark.operators.text import benchmark_contamination

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),            # contains the probe verbatim
            (2, "x y z a b c d e f g h different"),# probe 8-gram inside
            (3, "totally unrelated words here now and then more"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("a b c d e f g h",)], "text string")
    rows = {r.doc_id: r for r in benchmark_contamination(docs, probes, n=8).collect()}
    # doc 1: 3 grams (10 tokens), gram at pos 1 matches
    assert rows[1].n_grams == 3 and rows[1].contaminated_grams == 1
    # doc 2: 5 grams (12 tokens), the a..h gram at pos 4 matches
    assert rows[2].n_grams == 5 and rows[2].contaminated_grams == 1
    assert rows[3].contaminated_grams == 0 and rows[3].contamination == 0.0
    assert rows[4].n_grams == 0 and rows[4].contamination == 0.0


def test_unigram_logloss_ranks_rarity(spark):
    import math

    from matcha_spark.operators.text import unigram_logloss

    docs = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common rare"),
         (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logloss(docs).collect()}
    # corpus: 'common' x5, 'rare' x1, total 6
    nll_common = -math.log(5 / 6)
    nll_rare = -math.log(1 / 6)
    assert rows[1].n_tokens == 4
    assert abs(rows[1].logloss - round(nll_common, 4)) < 1e-9
    assert abs(rows[2].logloss - round((nll_common + nll_rare) / 2, 4)) < 1e-4
    assert rows[2].logloss > rows[1].logloss  # rare-token doc scores worse
    assert rows[3].n_tokens == 0 and rows[3].logloss == 0.0


def test_normalize_text_forms(spark):
    import unicodedata

    from matcha_spark.operators.text import normalize_text

    decomposed = "Café"          # e + combining acute
    composed = "Café"
    ligature = "ﬁle"              # fi ligature + 'le'
    fullwidth = "Ｈｉ"         # fullwidth 'Hi'
    docs = spark.createDataFrame(
        [(1, decomposed), (2, ligature), (3, fullwidth), (4, None)],
        "doc_id long, text string",
    )
    nfc = {r.doc_id: r.text for r in normalize_text(docs, "NFC").collect()}
    assert nfc[1] == composed            # combining mark composes
    assert nfc[2] == ligature            # NFC preserves compatibility chars
    assert nfc[4] == ""                  # NULL -> empty
    nfkc = {r.doc_id: r.text for r in normalize_text(docs, "NFKC").collect()}
    assert nfkc[2] == "file"             # ligature decomposes
    assert nfkc[3] == "Hi"               # fullwidth folds
    assert nfkc[1] == unicodedata.normalize("NFKC", decomposed)
    import pytest as _p
    with _p.raises(ValueError):
        normalize_text(docs, "NFX")


def test_curate_corpus_stage_order_and_verdicts(spark):
    """Stage semantics: a duplicate of a quality-rejected doc is NOT a
    duplicate (dedup groups form among quality survivors only); keep-
    first picks the min id; contamination applies to remaining docs;
    every input gets exactly one verdict."""
    from matcha_spark.pipelines import curate_corpus

    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all") 
    docs = spark.createDataFrame(
        [
            (1, good),                       # kept
            (2, good),                       # duplicate of 1
            (3, "x!!"),                      # quality reject
            (4, "x!!"),                      # ALSO quality reject (not 'duplicate')
            (5, good + " unique ending of a kept document here now"),  # kept
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3
    ).collect()}
    assert out == {1: "kept", 2: "duplicate", 3: "quality", 4: "quality", 5: "kept"}

    # contamination stage: probe overlap above the cap rejects doc 5's dup-free text
    probes = spark.createDataFrame([(good,)], "text string")
    out2 = {r.doc_id: r.status for r in curate_corpus(
        docs, probes, min_tokens=5, max_punct_ratio=0.3,
        contamination_n=8, max_contamination=0.5,
    ).collect()}
    assert out2[1] == "contaminated"     # fully matches the probe
    assert out2[2] == "duplicate"        # dedup verdict comes first
    assert out2[3] == "quality"


def test_curate_corpus_survivor_score(spark):
    """survivor_score flips every dedup method's keeper from min-id to
    best-scoring (keep_best_map semantics): exact groups (normalized-
    equal, raw lengths differ via whitespace) and LSH clusters both
    keep the longest member; default (no score) behavior unchanged."""
    from pyspark.sql import functions as F

    from matcha_spark.pipelines import curate_corpus

    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all")
    padded = good.replace(" ", "  ")  # same normalized text, longer raw
    docs = spark.createDataFrame(
        [(1, good), (2, padded), (3, good + " with a genuinely distinct tail here")],
        "doc_id long, text string",
    )
    # default: min id keeps
    out = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3
    ).collect()}
    assert out == {1: "kept", 2: "duplicate", 3: "kept"}
    # keep-best: the padded (longer) copy survives the exact group
    best = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3,
        survivor_score=F.length("text"),
    ).collect()}
    assert best == {1: "duplicate", 2: "kept", 3: "kept"}
    # lsh path: near-dup cluster keeps the longest member
    near = spark.createDataFrame(
        [(1, good), (2, good + " plus an extra closing sentence of words"),
         (3, "entirely different content about other topics and things here")],
        "doc_id long, text string",
    )
    best_lsh = {r.doc_id: r.status for r in curate_corpus(
        near, None, min_tokens=5, max_punct_ratio=0.3,
        dedup_method="lsh", dedup_kwargs={"threshold": 0.5},
        survivor_score=F.length("text"),
    ).collect()}
    assert best_lsh == {1: "duplicate", 2: "kept", 3: "kept"}
    # simhash path: same contract (the padded twin has identical
    # tokens -> hamming 0; a whole extra sentence would exceed the
    # candidate threshold, which is the operator's own contract)
    best_sh = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3,
        dedup_method="simhash", dedup_kwargs={"max_hamming": 8},
        survivor_score=F.length("text"),
    ).collect()}
    assert best_sh[2] == "kept" and best_sh[1] == "duplicate"
    # the score may reference ANY input column (the advertised
    # quality-classifier case), not just doc_id/text: evaluated before
    # the (doc_id, text) projection (r15 advice fix)
    scored = spark.createDataFrame(
        [(1, good, 0.2), (2, padded, 0.9),
         (3, good + " with a genuinely distinct tail here", 0.5)],
        "doc_id long, text string, clf_score double",
    )
    best_clf = {r.doc_id: r.status for r in curate_corpus(
        scored, None, min_tokens=5, max_punct_ratio=0.3,
        survivor_score=F.col("clf_score"),
    ).collect()}
    assert best_clf == {1: "duplicate", 2: "kept", 3: "kept"}


def test_curate_corpus_url_stages(spark):
    """Optional crawl-head stages (r11): blocked_domain fires before
    url_duplicate fires before quality; url dedup groups form among
    blocklist survivors; the default path is unchanged when both are
    off."""
    from matcha_spark.pipelines import curate_corpus

    good = ("the cat and the dog sat in the house that is it for a story "
            "about the animals and their day together in it all")
    docs = spark.createDataFrame(
        [
            (1, good, "https://keep.org/a"),                  # kept
            (2, good + " two", "https://keep.org/a?utm_source=x"),  # url dup of 1
            (3, "x!!", "https://spam.net/z"),                 # blocked (not 'quality')
            (4, "x!!", "https://keep.org/bad"),               # quality reject
            # same URL as the BLOCKED doc 3: doc 5 survives the url
            # dedup because blocked docs don't found url groups
            (5, good + " five", "https://spam.net/z"),
        ],
        "doc_id long, text string, url string",
    )
    out = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3,
        blocked_domains=["spam.net"], url_dedup=True,
    ).collect()}
    # doc 5's host is spam.net too — blocked, NOT url_duplicate
    assert out == {1: "kept", 2: "url_duplicate", 3: "blocked_domain",
                   4: "quality", 5: "blocked_domain"}

    # url_dedup alone (no blocklist): 5 forms a url group with 3; min wins
    out2 = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3, url_dedup=True,
    ).collect()}
    assert out2 == {1: "kept", 2: "url_duplicate", 3: "quality",
                    4: "quality", 5: "url_duplicate"}

    # default path: identical to the cascade without URL columns
    plain = {r.doc_id: r.status for r in curate_corpus(
        docs.select("doc_id", "text"), None, min_tokens=5,
        max_punct_ratio=0.3,
    ).collect()}
    with_url_cols = {r.doc_id: r.status for r in curate_corpus(
        docs, None, min_tokens=5, max_punct_ratio=0.3,
    ).collect()}
    assert plain == with_url_cols
    assert plain[3] == "quality" and plain[1] == "kept"


def test_strip_dup_ngrams_planted(spark):
    """The canonical first occurrence of a duplicated 5-gram survives;
    every other occurrence's span is removed (case-insensitive match,
    original case preserved); overlapping duplicated spans merge."""
    from matcha_spark.operators.text import strip_dup_ngrams

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail a b c d"),           # canonical owner (min doc_id, start)
            (2, f"intro x {shared.upper()} more words here"),  # dup (case-blind)
            (3, "nothing duplicated in this doc at all"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in strip_dup_ngrams(docs, n=5).collect()}
    assert out[1] == f"{shared} tail a b c d"         # untouched
    assert out[2] == "intro x more words here"         # span removed, case kept
    assert out[3] == "nothing duplicated in this doc at all"
    assert out[4] == "tiny"
    # a doc that IS the duplicated span comes back empty
    docs2 = spark.createDataFrame(
        [(1, shared), (2, shared)], "doc_id long, text string"
    )
    out2 = {r.doc_id: r.text for r in strip_dup_ngrams(docs2, n=5).collect()}
    assert out2[1] == shared and out2[2] == ""


def test_mixture_sample_rates_and_nesting(spark):
    from matcha_spark.operators.text import mixture_sample, sample_hash

    docs = _docs(spark)
    out = mixture_sample(docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    sizes = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert per.get("src0") == sizes["src0"]     # rate 1.0 keeps everything
    assert "src1" not in per                     # rate 0.0 keeps nothing
    # nesting: a group's draw at rate r is exactly sample_hash(r) on it
    want = {r.doc_id for r in sample_hash(docs.where("source = 'src2'"), 0.5).collect()}
    got = {r.doc_id for r in out.where("source = 'src2'").collect()}
    assert got == want
    # raising a rate only ADDS documents (nested draws)
    bigger = mixture_sample(docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.8)
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in bigger.collect()}
    assert a <= b
    import pytest as _p
    with _p.raises(ValueError):
        mixture_sample(docs, {"src0": 1.5})


def test_compression_ratio(spark):
    """r11: zlib ratio separates templated repetition from prose from
    high-entropy noise; empty/null → NULL; deterministic."""
    import random as _r

    from matcha_spark.operators.text import compression_ratio

    rng = _r.Random(7)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(4000))
    prose = ("the quick brown fox jumps over the lazy dog and then considers "
             "a different route home through the quiet evening streets ") * 12
    rows = [
        (1, "spam ham " * 500),
        (2, prose),
        (3, noise),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.compression_ratio for r in compression_ratio(docs).collect()}
    assert out[1] < 0.05                      # pure repetition crushes
    assert 0.05 < out[2] < 0.5                # prose compresses moderately
    assert out[3] > out[2] + 0.2              # random noise barely compresses
    assert out[4] is None and out[5] is None
    again = {r.doc_id: r.compression_ratio for r in compression_ratio(docs).collect()}
    assert again == out


def test_importance_sample(spark):
    """r11: weighted Poisson draw — decisions replicate exactly from
    the md5 family hash in Python, weight-monotone, zero/negative/null
    weights never keep, default scale keeps the max-weight row."""
    import hashlib

    from matcha_spark.operators.text import importance_sample

    rows = [(i, float(w)) for i, w in enumerate([0.0, 0.1, 0.3, 0.5, 0.9, 1.0, -1.0])]
    rows.append((7, None))
    docs = spark.createDataFrame(rows, "doc_id long, w double")

    def py_keep(key, w, scale, salt=""):
        if w is None or w < 0:
            return False
        h = hashlib.md5((salt + str(key)).encode()).hexdigest()
        return int(h[:13], 16) / 16**13 < w * scale

    got = {r.doc_id for r in importance_sample(docs, "w", scale=1.0).collect()}
    want = {i for i, w in rows if py_keep(i, w, 1.0)}
    assert got == want
    assert 0 not in got and 6 not in got and 7 not in got
    # default scale = 1/max(w) = 1.0 here; max-weight row kept surely
    assert {r.doc_id for r in importance_sample(docs, "w").collect()} == want
    assert 5 in got  # w*scale = 1 > any u
    # monotone in scale: lower scale keeps a subset
    lower = {r.doc_id for r in importance_sample(docs, "w", scale=0.5).collect()}
    assert lower <= got
    # all-nonpositive weights → empty, not an error
    neg = docs.where("w <= 0")
    assert importance_sample(neg, "w").count() == 0
    import pytest as _p

    with _p.raises(ValueError):
        importance_sample(docs, "w", scale=0.0)


def test_cap_per_group(spark):
    """r11: per-group quota — exact cap, small groups untouched,
    deterministic and nested across caps."""
    from matcha_spark.operators.text import cap_per_group

    rows = [(i, "web", "t") for i in range(50)] + [
        (100 + i, "wiki", "t") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = cap_per_group(docs, 10)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert per == {"web": 10, "wiki": 3}
    assert out.columns == docs.columns
    # nested: the 5-cap keep set is inside the 10-cap one; reruns agree
    small = {r.doc_id for r in cap_per_group(docs, 5).collect()}
    big = {r.doc_id for r in out.collect()}
    assert small <= big
    assert {r.doc_id for r in cap_per_group(docs, 10).collect()} == big
    import pytest as _p

    with _p.raises(ValueError):
        cap_per_group(docs, 0)


def test_write_corpus_shards(spark, tmp_path):
    """r11: sharded writer — every shard ≤ rows_per_shard, shards are
    contiguous non-overlapping slices of the deterministic global
    order, and the order is reproducible across writes."""
    from matcha_spark.operators.text import shard_manifest, write_corpus_shards

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("doc "), "id").alias("text")
    )
    out = str(tmp_path / "shards")
    n = write_corpus_shards(docs, out, rows_per_shard=100, mode="overwrite")
    assert n == 1000
    man = shard_manifest(spark, out).collect()
    assert sum(r.rows for r in man) == 1000
    assert max(r.rows for r in man) <= 100
    assert man[0].pos_min == 0 and man[-1].pos_max == 999
    for prev, cur in zip(man, man[1:]):
        assert cur.pos_min == prev.pos_max + 1  # contiguous, no overlap
    # the global order is a pure function of the corpus + salt
    out2 = str(tmp_path / "shards2")
    write_corpus_shards(docs, out2, rows_per_shard=100, mode="overwrite")
    a = [r.doc_id for r in spark.read.parquet(out).orderBy("shuffle_pos").collect()]
    b = [r.doc_id for r in spark.read.parquet(out2).orderBy("shuffle_pos").collect()]
    assert a == b

    import pytest as _p

    with _p.raises(ValueError):
        write_corpus_shards(docs, out, rows_per_shard=0)
    # edges: sub-shard corpus → one shard; empty corpus → 0 rows,
    # empty (schema-bearing) manifest — neither errors
    tiny = docs.where("doc_id < 3")
    assert write_corpus_shards(tiny, str(tmp_path / "tiny"), 100) == 3
    assert shard_manifest(spark, str(tmp_path / "tiny")).count() == 1
    none = docs.where("doc_id < 0")
    assert write_corpus_shards(none, str(tmp_path / "none"), 100) == 0
    assert shard_manifest(spark, str(tmp_path / "none")).count() == 0


def test_quality_filter_compression_band(spark):
    """r11: the optional compression band rejects templated repetition
    and high-entropy noise; OFF by default (result and schema
    unchanged)."""
    import random as _r

    from matcha_spark.operators.text import quality_filter

    rng = _r.Random(11)
    prose = ("a sensible sentence with common short words that any "
             "quality gate should keep around for training ") * 10
    rows = [
        (1, prose),
        (2, "the spam line repeats here " * 300),
        (3, " ".join("".join(rng.choice("qxzjvkw") for _ in range(7)) for _ in range(200))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = quality_filter(docs, min_stopword_ratio=0.0, max_avg_token_len=20.0)
    banded = quality_filter(
        docs, min_stopword_ratio=0.0, max_avg_token_len=20.0,
        min_compression_ratio=0.05, max_compression_ratio=0.45,
    )
    assert base.schema == banded.schema
    assert {r.doc_id for r in base.collect()} >= {1, 2}
    assert {r.doc_id for r in banded.collect()} == {1}


def test_temperature_mixture(spark):
    """r11: temperature-smoothed rates — exact n^(alpha-1)/max formula,
    alpha=1 keeps everything, alpha=0 equalizes expected counts, the
    composed sampler is literally mixture_sample(rates), and lowering
    alpha only removes majority-group documents (nested draws)."""
    from matcha_spark.operators.text import (
        mixture_sample,
        temperature_mixture,
        temperature_mixture_rates,
    )

    rows = (
        [(i, "big", "t") for i in range(80)]
        + [(1000 + i, "mid", "t") for i in range(20)]
        + [(2000 + i, "small", "t") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    r1 = temperature_mixture_rates(docs, 1.0)
    assert r1 == {"big": 1.0, "mid": 1.0, "small": 1.0}
    r0 = temperature_mixture_rates(docs, 0.0)
    # alpha=0: r ∝ 1/n, rescaled so the smallest group's rate is 1
    assert r0 == {"big": 5 / 80, "mid": 5 / 20, "small": 1.0}
    rh = temperature_mixture_rates(docs, 0.5)
    assert rh["small"] == 1.0
    assert abs(rh["big"] - (80 / 5) ** -0.5) < 1e-12
    assert abs(rh["mid"] - (20 / 5) ** -0.5) < 1e-12

    # the convenience wrapper IS mixture_sample over those rates
    got = {r.doc_id for r in temperature_mixture(docs, 0.5).collect()}
    want = {r.doc_id for r in mixture_sample(docs, rh).collect()}
    assert got == want
    # lowering alpha only removes (majority-group) documents
    lower = {r.doc_id for r in temperature_mixture(docs, 0.25).collect()}
    assert lower <= got
    assert {d for d in got if d >= 2000} == {d for d in lower if d >= 2000}

    import pytest as _p

    with _p.raises(ValueError):
        temperature_mixture_rates(docs, -0.1)
    assert temperature_mixture_rates(docs.where("doc_id < 0"), 0.5) == {}


@pytest.mark.parametrize("seed", range(6))
def test_dedup_paragraphs_differential(spark, seed):
    """Randomized differential: dedup_paragraphs vs a direct Python
    model of canonical-first corpus-wide paragraph dedup."""
    import random

    from matcha_spark.operators.text import dedup_paragraphs

    rng = random.Random(7700 + seed)
    vocab = ["aa bb", "cc dd", "ee", "ff gg hh", "x"]
    docs = []
    for did in range(rng.randint(2, 6)):
        paras = [rng.choice(vocab) for _ in range(rng.randint(0, 5))]
        docs.append((did, "\n\n".join(paras)))

    # model
    min_chars = 2
    first = {}
    for did, text in docs:
        for idx, p in enumerate(text.split("\n\n")):
            if len(p.strip()) >= min_chars and p not in first:
                first[p] = (did, idx)
    want = {}
    for did, text in docs:
        kept = [
            p
            for idx, p in enumerate(text.split("\n\n"))
            if len(p.strip()) < min_chars or first.get(p) == (did, idx)
        ]
        want[did] = ("\n\n".join(kept), len(text.split("\n\n")), len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_paras, r.n_kept)
        for r in dedup_paragraphs(df, min_chars=min_chars).collect()
    }
    assert got == want, f"seed={seed}\ndocs={docs}\ngot={got}\nwant={want}"


def test_bpe_pretoken_count_segments(spark):
    """The pre-tokenizer split: leading spaces attach to the following
    run, contractions stay with their word, digit and punctuation runs
    split off, whitespace runs don't count."""
    from matcha_spark.operators.text import bpe_pretoken_count

    docs = spark.createDataFrame(
        [
            (1, "don't stop"),  # [don't][ stop] -> 2
            (2, "abc123!?"),  # [abc][123][!?] -> 3
            (3, "a  b\t\nc"),  # ws runs absorbed -> 3
            (4, ""),  # -> 0
            (5, None),  # -> 0
            (6, "x+y=2, ok."),  # [x][+][y][=][2][,][ ok][.] -> 8
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_pretokens, r.n_chars) for r in bpe_pretoken_count(docs).collect()}
    assert out[1] == (2, 10)
    assert out[2] == (3, 8)
    assert out[3][0] == 3
    assert out[4] == (0, 0)
    assert out[5] == (0, 0)
    assert out[6][0] == 8


def test_chunk_packing_concat_and_chunk(spark):
    """r09 concat-and-chunk packing vs a brute-force Python model:
    chunk budgets exact (all but the last chunk full), per-doc slices
    tile [0, n), straddling docs split correctly, zero-token docs
    vanish, and the output is independent of the partition count (the
    two-phase prefix sum is partitioning-invariant)."""
    from matcha_spark.operators.text import chunk_packing

    rows = [
        (1, "a b c d e"),        # 5 tokens
        (2, ""),                  # zero tokens: no space
        (3, "f g h"),            # 3
        (4, "i"),                # 1
        (5, None),                # zero
        (6, " ".join("x" * 1 for _ in range(9))),  # 9
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    B = 4
    got = {
        (r.chunk_id, r.doc_id): (r.tok_start, r.tok_end)
        for r in chunk_packing(docs, budget=B).collect()
    }
    # model: concat 5+3+1+9 = 18 tokens -> chunks of 4: [0,4) [4,8) ...
    sizes = {1: 5, 3: 3, 4: 1, 6: 9}
    off, want = 0, {}
    for doc in sorted(sizes):
        n = sizes[doc]
        for c in range(off // B, (off + n - 1) // B + 1):
            want[(c, doc)] = (max(0, c * B - off), min(n, (c + 1) * B - off))
        off += n
    assert got == want
    # every chunk but the last carries exactly B tokens
    per_chunk = {}
    for (c, _d), (s, e) in got.items():
        per_chunk[c] = per_chunk.get(c, 0) + (e - s)
    last = max(per_chunk)
    assert all(v == B for c, v in per_chunk.items() if c != last)
    assert per_chunk[last] == 18 - B * last
    # per-doc slices tile the doc exactly
    for doc, n in sizes.items():
        slices = sorted(v for (c, d), v in got.items() if d == doc)
        assert slices[0][0] == 0 and slices[-1][1] == n
        for (s1, e1), (s2, e2) in zip(slices, slices[1:]):
            assert e1 == s2
    # partition-count invariance
    for parts in (1, 3, 7):
        alt = {
            (r.chunk_id, r.doc_id): (r.tok_start, r.tok_end)
            for r in chunk_packing(docs, budget=B, num_parts=parts).collect()
        }
        assert alt == got


@pytest.mark.parametrize("seed", range(12))
def test_strip_html_property_fuzz(spark, seed):
    """Randomized differential for the markup extractor: generated
    HTML soup (nested/unterminated tags, script/style blocks with
    stray '<' inside, comments, mixed-case tags, entities incl.
    double-escapes, whitespace zoo) through strip_html vs an exact
    Python mirror of its DOCUMENTED cascade — same patterns, same
    order, Java's ASCII \\s class ([ \\t\\n\\x0b\\f\\r]) mirrored
    literally so a Python-unicode-\\s sloppiness in the mirror can't
    mask an engine divergence."""
    import random as _r
    import re

    from matcha_spark.operators.text import _HTML_ENTITIES, strip_html

    rng = _r.Random(1000 + seed)
    words = ["alpha", "beta", "Gamma", "δelta", "x&y", "a<b", "c>d", "e"]
    ents = ["&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;",
            "&amp;lt;", "&unknown;", "&#160;"]
    ws = [" ", "  ", "\t", "\n", "\r\n", "\x0b", "\f"]
    tags = ["<p>", "</p>", "<DIV class='x'>", "</div>", "<br/>",
            "<a href=\"u?q=1&r=2\">", "</a>", "<em", "em>", "<>", "< p >"]

    def soup():
        parts = []
        for _ in range(rng.randint(0, 40)):
            kind = rng.random()
            if kind < 0.35:
                parts.append(rng.choice(words))
            elif kind < 0.5:
                parts.append(rng.choice(tags))
            elif kind < 0.6:
                parts.append(rng.choice(ents))
            elif kind < 0.7:
                parts.append(rng.choice(ws))
            elif kind < 0.8:
                inner = " ".join(rng.choices(words + ["<", ">", "&lt;"], k=3))
                tag = rng.choice(["script", "SCRIPT", "style"])
                closer = "</script>" if tag.lower() == "script" else "</style>"
                parts.append(f"<{tag} type='t'>{inner}{closer if rng.random() < 0.8 else ''}")
            else:
                parts.append(f"<!-- {' '.join(rng.choices(words, k=2))} {'-->' if rng.random() < 0.8 else ''}")
        return "".join(parts)

    def mirror(s):
        s = s or ""
        s = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", s)
        s = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", s)
        s = re.sub(r"(?s)<!--.*?-->", " ", s)
        s = re.sub(r"(?s)<[^>]*>", " ", s)
        for ent, ch in _HTML_ENTITIES:
            s = s.replace(ent, ch)
        s = re.sub(r"[ \t\n\x0b\f\r]+", " ", s)
        return s.strip(" ")

    rows = [(i, soup()) for i in range(25)] + [(98, None), (99, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in strip_html(docs).collect()}
    want = {i: mirror(t) for i, t in rows}
    assert got == want, {
        k: (repr(got[k]), repr(want[k]), repr(dict(rows)[k]))
        for k in got
        if got[k] != want[k]
    }


@pytest.mark.parametrize("seed", range(8))
def test_scrub_pii_property_fuzz(spark, seed):
    """Randomized differential for the PII scrubber: generated soup
    (emails, near-emails, phone shapes with mixed separators, IPs and
    out-of-range IPs, digit runs, unicode digits, adjacent hits)
    through scrub_pii vs a Python mirror running the SAME ordered
    patterns under re.ASCII — the honest mirror of Java's ASCII
    \\d/\\w/\\b classes, so a unicode-digit divergence in either
    engine breaks the test instead of hiding."""
    import random as _r
    import re

    from matcha_spark.operators.text import _PII_PATTERNS, scrub_pii

    rng = _r.Random(3000 + seed)
    atoms = [
        "bob@example.com", "a.b+c@x-y.co", "bad@@x.com", "no@tld",
        "@leading.com", "x@y.z", "(555) 867-5309", "+44 20 7946 0958",
        "555.867.5309", "12345678", "123", "192.168.0.1",
        "999.999.999.999", "1.2.3.4.5", "v1.2.3", "word", "emoji🙂",
        "٣٤٥٦٧٨٩٠١٢",  # unicode digits: ASCII classes must ignore
        "tel:", ".", "-", " ", "\n",
    ]

    def soup():
        return " ".join(rng.choices(atoms, k=rng.randint(0, 25)))

    def mirror(s):
        for pat, tag in _PII_PATTERNS:
            s = re.sub(pat, tag, s, flags=re.ASCII)
        return s

    rows = [(i, soup()) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in scrub_pii(docs).collect()}
    want = {i: mirror(t) for i, t in rows}
    assert got == want, {
        k: (repr(got[k]), repr(want[k]), repr(dict(rows)[k]))
        for k in got
        if got[k] != want[k]
    }


def test_strip_html_rules(spark):
    """Each stripping rule individually: block-content drop, tag->space
    word boundary, entity decode, comment removal, whitespace collapse,
    and plain text passing through untouched."""
    from matcha_spark.operators.text import strip_html

    docs = spark.createDataFrame(
        [
            (1, "<p>hello <b>world</b></p>"),
            (2, "a<script type='x'>var q = \"<p>\";</script>b"),
            (3, "x<style>.c { color: red }</style>y"),
            (4, "<!-- note -->kept"),
            (5, "fish &amp; chips &lt;3 &quot;ok&quot;&nbsp;&#39;y&#39;"),
            (6, "no markup at all"),
            (7, "spaced   <div>   out </div>  "),
            (8, None),
            (9, "<a href='u'>link</a>text"),  # tag becomes a boundary
            # regression (r09 advice): escaped entities must NOT
            # double-decode — &amp; is replaced LAST
            (10, "x &amp;lt; y &amp;amp; z"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in strip_html(docs).collect()}
    assert out[1] == "hello world"
    assert out[2] == "a b"
    assert out[3] == "x y"
    assert out[4] == "kept"
    assert out[5] == "fish & chips <3 \"ok\" 'y'"
    assert out[6] == "no markup at all"
    assert out[7] == "spaced out"
    assert out[8] == ""
    assert out[9] == "link text"
    assert out[10] == "x &lt; y &amp; z"


def test_corpus_shuffle_total_order_and_partition_invariance(spark):
    """r10: shuffle positions are a bijection onto 0..n-1, follow the
    md5 order exactly, and do not depend on the input partitioning
    (the property df.sample-style per-partition RNG lacks)."""
    from matcha_spark.operators.text import corpus_shuffle

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(97)], "doc_id long, text string"
    )
    out = {r.doc_id: r.shuffle_pos for r in corpus_shuffle(docs).collect()}
    assert sorted(out.values()) == list(range(97))
    # md5 order replicated driver-side
    import hashlib

    want_order = sorted(out, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert [i for i, _ in sorted(out.items(), key=lambda kv: kv[1])] == want_order
    # partitioning-independent (different range boundaries, same result)
    out2 = {
        r.doc_id: r.shuffle_pos
        for r in corpus_shuffle(docs.repartition(7), num_parts=3).collect()
    }
    assert out2 == out
    # a different salt is a different permutation
    out3 = {r.doc_id: r.shuffle_pos for r in corpus_shuffle(docs, salt="ep1").collect()}
    assert out3 != out and sorted(out3.values()) == list(range(97))


def test_split_assign_disjoint_exhaustive_consistent(spark):
    """r10: every row lands in exactly one split, rates roughly hold,
    assignment is a pure key function (consistent across tables), and
    bad rate specs raise."""
    import pytest as _pt

    from matcha_spark.operators.text import split_assign

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], "doc_id long, text string"
    )
    out = {r.doc_id: r.split for r in split_assign(docs).collect()}
    assert len(out) == 400 and set(out.values()) <= {"train", "val", "test"}
    n_train = sum(1 for v in out.values() if v == "train")
    assert 320 <= n_train <= 395  # 0.9 of 400, wide tolerance
    # same keys in a different "table" get the same assignment
    other = spark.createDataFrame(
        [(i, i * 2) for i in range(400)], "doc_id long, v long"
    )
    out2 = {r.doc_id: r.split for r in split_assign(other).collect()}
    assert out2 == out
    with _pt.raises(ValueError):
        split_assign(docs, {"a": 0.5, "b": 0.2})  # doesn't sum to 1
    with _pt.raises(ValueError):
        split_assign(docs, {"only": 1.0})


def test_epoch_upsample_copies(spark):
    """r10: integer weights replicate exactly; fractional weights add
    the extra copy for precisely the md5-draw subset; weight 0 drops;
    copy_idx is dense 0..n-1 per kept doc."""
    from matcha_spark.operators.text import epoch_upsample, sample_hash

    rows = [(i, f"t {i}", ["a", "b", "c"][i % 3]) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = epoch_upsample(
        docs, {"a": 2.0, "b": 1.5, "c": 0.0}, default_weight=1.0
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    a_ids = {i for i, _, s in rows if s == "a"}
    b_ids = {i for i, _, s in rows if s == "b"}
    c_ids = {i for i, _, s in rows if s == "c"}
    assert all(sorted(by_doc[i]) == [0, 1] for i in a_ids)
    assert not (c_ids & set(by_doc))
    # the b docs with a third... second copy are exactly sample_hash(0.5)
    drawn = {r.doc_id for r in sample_hash(docs.where("source = 'b'"), 0.5).collect()}
    for i in b_ids:
        assert sorted(by_doc[i]) == ([0, 1] if i in drawn else [0])


def test_length_batches_bounds(spark):
    """r10: batches are dealt within a bucket — every batch holds at
    most batch_size docs, ids are dense from 0 per bucket, and bucket
    = n_tokens div width."""
    from matcha_spark.operators.text import length_batches

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 37))) for i in range(150)],
        "doc_id long, text string",
    )
    out = length_batches(docs, bucket_width=8, batch_size=4).collect()
    assert len(out) == 150
    sizes = {}
    for r in out:
        assert r.bucket == r.n_tokens // 8
        sizes.setdefault((r.bucket, r.batch_id), 0)
        sizes[(r.bucket, r.batch_id)] += 1
    assert all(n <= 4 for n in sizes.values())
    for b in {k[0] for k in sizes}:
        ids = sorted(k[1] for k in sizes if k[0] == b)
        assert ids == list(range(len(ids)))


def test_length_batches_salted_subbuckets(spark):
    """r11 (verdict ask #6): a uniform-length corpus over the
    max_bucket_rows threshold is dealt across salted sub-buckets — the
    ranking window partitions by (bucket, sub) so no single task sees
    the whole corpus — while every batch still holds <= batch_size
    same-bucket docs, assignment is deterministic under repartitioning,
    and the default path is byte-identical to r10."""
    from matcha_spark.operators.text import length_batches

    docs = spark.createDataFrame(
        [(i, "one two three four five") for i in range(100)],
        "doc_id long, text string",
    )
    salted = length_batches(docs, bucket_width=8, batch_size=4,
                            max_bucket_rows=30)
    # multi-task plan: the window partitions on the salt column too
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__sub" in plan
    rows = salted.collect()
    assert len(rows) == 100 and {r.bucket for r in rows} == {0}
    sizes = {}
    for r in rows:
        sizes.setdefault(r.batch_id, 0)
        sizes[r.batch_id] += 1
    assert all(n <= 4 for n in sizes.values())
    # ceil(100/30) = 4 sub-buckets -> >= ceil(100/(4*30/4)) batches and
    # at most 4 short final batches
    short = sum(1 for n in sizes.values() if n < 4)
    assert short <= 4
    # the salt actually spreads rows: with 4 sub-buckets the window
    # would otherwise emit one dense 0..24 id range; interleaved ids
    # must cover every residue class that received rows
    assert len({b % 4 for b in sizes}) > 1
    # deterministic under repartitioning
    again = {
        (r.doc_id, r.batch_id)
        for r in length_batches(
            docs.repartition(7), bucket_width=8, batch_size=4,
            max_bucket_rows=30,
        ).collect()
    }
    assert again == {(r.doc_id, r.batch_id) for r in rows}
    # default (unsalted) path unchanged: dense ids from 0
    base = length_batches(docs, bucket_width=8, batch_size=4).collect()
    ids = sorted({r.batch_id for r in base})
    assert ids == list(range(25))


def test_split_assign_thresholds_exact(spark):
    """r10 review finding: cumulative band boundaries must equal the
    nominal cumulative rates exactly — float accumulation would put
    0.9+0.05 a ULP past 0.95 and disagree with any oracle written
    against the nominal literal."""
    from matcha_spark.operators.text import rate_threshold_hex, split_assign

    docs = spark.createDataFrame(
        [(i, "t") for i in range(50)], "doc_id long, text string"
    )
    plan = split_assign(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert rate_threshold_hex(0.95) in plan
    assert rate_threshold_hex(0.9 + 0.05) not in plan or (
        rate_threshold_hex(0.9 + 0.05) == rate_threshold_hex(0.95)
    )


def test_bigram_logloss_hand_model(spark):
    """r11: interpolated bigram LM vs a literal Python replay, plus the
    two behaviors that motivate the op — repeated common bigrams score
    lower than the same words shuffled, and empty docs come back 0."""
    import math
    from collections import Counter

    from matcha_spark.operators.text import BOS, bigram_logloss

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the mat",
        3: "mat the on sat cat the",   # same words, scrambled
        4: "",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logloss(docs, alpha=0.4).collect()}

    # literal replay
    pairs = []
    for t in texts.values():
        ws = [BOS] + t.lower().split()
        pairs += list(zip(ws, ws[1:]))
    c2 = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    cu = Counter(w2 for _, w2 in pairs)
    T = sum(cu.values())

    def score(t):
        ws = [BOS] + t.lower().split()
        ps = list(zip(ws, ws[1:]))
        if not ps:
            return 0, 0.0
        nll = [
            -math.log(0.4 * c2[p] / c1[p[0]] + 0.6 * cu[p[1]] / T) for p in ps
        ]
        return len(ps), round(sum(nll) / len(ps), 4)

    for did, t in texts.items():
        n, ll = score(t)
        assert (out[did].n_tokens, out[did].logloss) == (n, ll), did
    # the scrambled doc's bigrams are corpus-rare -> higher loss
    assert out[3].logloss > out[1].logloss


def test_string_doc_ids_cdc_and_normalize(spark):
    """cdc_chunks and normalize_text adopt the input's doc_id type —
    the same string-id generalization as the dedup/BPE kernels."""
    from matcha_spark.operators.text import cdc_chunks, normalize_text

    docs = spark.createDataFrame(
        [("w-1", "the quick brown fox jumps over the lazy dog " * 4),
         ("w-2", "Café")],
        "doc_id string, text string",
    )
    ch = cdc_chunks(docs, avg_size=32)
    assert ch.schema["doc_id"].dataType.simpleString() == "string"
    per = {r.doc_id for r in ch.collect()}
    assert per == {"w-1", "w-2"}
    norm = normalize_text(docs, "NFC")
    assert norm.schema["doc_id"].dataType.simpleString() == "string"
    got = {r.doc_id: r.text for r in norm.collect()}
    assert got["w-2"] == "Café"


def test_perplexity_buckets_basic(spark):
    """Head/middle/tail tiering: fluent corpus-typical text buckets
    ahead of rare-token soup; every doc gets exactly one verdict; the
    head set is the lowest-logloss third (ties at thresholds included
    by <=)."""
    from matcha_spark.operators.text import perplexity_buckets

    common = "the cat sat on the mat and the dog sat on the rug "
    rows = (
        [(f"c{i}", common * 3) for i in range(6)]          # corpus-typical
        + [(f"r{i}", f"zxqv{i} wkjy{i} qpzt{i} mvbn{i} "
                     f"xyzq{i} lkjh{i}") for i in range(3)]  # rare soup
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in perplexity_buckets(docs).collect()}
    assert len(out) == 9
    # the repeated common docs share one (low) logloss — all head+middle
    # boundary; the rare-token docs must be strictly worse
    worst = max(out.values(), key=lambda r: r.logloss)
    assert worst.doc_id.startswith("r") and worst.bucket == "tail"
    best = min(out.values(), key=lambda r: r.logloss)
    assert best.doc_id.startswith("c") and best.bucket == "head"
    assert all(r.bucket in ("head", "middle", "tail") for r in out.values())


def test_perplexity_buckets_per_group(spark):
    """Per-language bands: a doc that would be 'tail' against another
    language's distribution is banded only within its own group."""
    from matcha_spark.operators.text import perplexity_buckets

    rows = (
        [(f"a{i}", "alpha beta gamma " * (i + 2), "aa") for i in range(6)]
        + [(f"b{i}", "uno dos tres cuatro " * (i + 2), "bb") for i in range(6)]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    out = perplexity_buckets(docs, group_col="lang").collect()
    assert len(out) == 12
    per = {}
    for r in out:
        per.setdefault(r.lang, set()).add(r.bucket)
    # every group gets its own full banding, not one global split
    assert per["aa"] == {"head", "middle", "tail"} or len(per["aa"]) >= 2
    assert per["bb"] == {"head", "middle", "tail"} or len(per["bb"]) >= 2
    assert {r.lang for r in out} == {"aa", "bb"}


def test_perplexity_buckets_validation(spark):
    from matcha_spark.operators.text import perplexity_buckets

    docs = spark.createDataFrame([("d", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError):
        perplexity_buckets(docs, cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        perplexity_buckets(docs, cuts=(0.9, 0.1))
    with pytest.raises(ValueError):
        perplexity_buckets(docs, model="trigram")


def test_temperature_mixture_token_weighted(spark):
    """weight_col switches group mass to the column sum: a group of
    few HUGE documents is the majority by tokens and gets down-sampled
    even though it is the doc-count minority; alpha=1 is the identity
    either way."""
    from matcha_spark.operators.text import temperature_mixture_rates

    rows = (
        # 'big': 2 docs x 5000 tokens = 10k tokens
        [(f"b{i}", "big", 5000) for i in range(2)]
        # 'small': 20 docs x 10 tokens = 200 tokens
        + [(f"s{i}", "small", 10) for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id string, source string, n_tokens int")

    by_docs = temperature_mixture_rates(docs, 0.0)
    # doc-count view: 'big' (2 docs) is the minority -> kept whole
    assert by_docs["big"] == 1.0 and by_docs["small"] < 1.0

    by_toks = temperature_mixture_rates(docs, 0.0, weight_col="n_tokens")
    # token view: 'big' (10k tokens) is the majority -> down-sampled
    assert by_toks["small"] == 1.0
    assert abs(by_toks["big"] - 200 / 10_000) < 1e-12

    # alpha=1: natural distribution, all rates 1 under either mass
    assert set(temperature_mixture_rates(docs, 1.0, weight_col="n_tokens")
               .values()) == {1.0}


def test_curate_corpus_near_dup_methods(spark):
    """The batch cascade's near-dup modes: a one-character near-copy
    passes exact dedup but is rejected by simhash and lsh modes; the
    default exact path is untouched by the new parameters."""
    from matcha_spark.pipelines import curate_corpus

    base = ("a perfectly ordinary training document about nothing in "
            "particular that goes on for a while " * 3)
    docs = spark.createDataFrame(
        [
            ("a1", base + "original"),
            ("z1", base + "originaI"),  # near-copy (measured hamming 6)
            ("b1", "completely different content here okay then fine " * 3),
        ],
        "doc_id string, text string",
    )
    exact = {r.doc_id: r.status for r in curate_corpus(
        docs, min_tokens=5).collect()}
    assert exact == {"a1": "kept", "z1": "kept", "b1": "kept"}

    sh = {r.doc_id: r.status for r in curate_corpus(
        docs, min_tokens=5, dedup_method="simhash",
        dedup_kwargs={"max_hamming": 8},
    ).collect()}
    assert sh == {"a1": "kept", "z1": "duplicate", "b1": "kept"}

    lsh = {r.doc_id: r.status for r in curate_corpus(
        docs, min_tokens=5, dedup_method="lsh",
        dedup_kwargs={"threshold": 0.6},
    ).collect()}
    assert lsh == {"a1": "kept", "z1": "duplicate", "b1": "kept"}

    import pytest as _p
    with _p.raises(ValueError):
        curate_corpus(docs, dedup_method="bogus").collect()
