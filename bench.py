"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are forced with a noop-format write (full materialization, no
driver-collect overhead).  The triples graph is built and cached once
("index once, query many" — the reference's index-triples contract)
and its build time reported as graph_build.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("matcha-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r19 (guide §1.2 step 2 "per-task work" — here per-QUERY driver
        # work): PySpark 4's DataFrame debugging hook captures a Python
        # call site (frame walk + an extra py4j round trip) on EVERY
        # Column/DataFrame op; plan-heavy queries spend 30-60% of their
        # driver-side plan-construction time in it (graph_build lazy
        # build 0.96-1.04 s -> 0.69 s measured A/B).  Scale-independent
        # (pure driver-Python cost), results unchanged — it only
        # enriches error messages.  Off for production runs.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from matcha_spark import select_df
    from matcha_spark import relational as R
    from matcha_spark.operators import dedup as D
    from matcha_spark.operators import similarity as S
    from matcha_spark.operators import text as T
    from matcha_spark.sources.tpch_graph import load_tables
    from matcha_spark.suite import (
        _graph,
        bgp_agg_customers_by_region,
        bgp_customers_in_region,
        bgp_optional_urgent_orders,
        bgp_path_reach_urgent,
        bgp_path_region_members,
        doc_contamination,
        doc_contamination_bloom,
        doc_image_phash,
        doc_media_features,
        doc_pipeline_curate,
        doc_unigram_logloss,
        graph_closure_nations,
        graph_shortest_urgent,
    )

    times: dict[str, float] = {}
    spread: dict[str, dict] = {}
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # isolation mode (r11, verdict ask #4): SPARK_GRAFT_BENCH_ONLY=a,b
    # runs just the named entries in an otherwise-idle session — the
    # tool for attributing a driver-suite delta to the entry itself vs
    # the suite-composition jitter class (memo/graph-cache pressure from
    # the other ~70 entries) without hand-built forensics scripts
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {s.strip() for s in only_env.split(",") if s.strip()} or None
    # cache mode (r09): per-query numbers must not depend on suite
    # composition — which earlier entries warmed or evicted the 32-entry
    # memo LRU / 8-entry graph cache by the time this one runs.
    #   warm (default): before each entry, OTHER entries' leftover memo
    #     frames are dropped (their memory pressure can evict this
    #     entry's warm blocks mid-measurement), then the entry gets its
    #     own untimed warming run (repeat entries) or a graph-cache
    #     pre-warm (iterative closure entries, whose per-call iteration
    #     cost IS the measurement — they repeat too, min-of-N, since
    #     nothing is reused between calls).
    #   cold: every cache is cleared before each timed run — each entry
    #     pays its full build cost, every time.
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "warm")
    if mode not in ("warm", "cold"):
        raise SystemExit(f"SPARK_GRAFT_BENCH_MODE must be warm|cold, got {mode!r}")

    def clear_caches():
        from matcha_spark.cache import clear_memo
        from matcha_spark.suite import clear_graph_cache

        clear_memo()
        clear_graph_cache()

    def prewarm_graphs():
        _graph(spark, SF_DIR).df.count()
        _graph(
            spark, SF_DIR, include_orders=True, order_priority="1-URGENT"
        ).df.count()

    def bench(name, fn, repeat=True, prewarm="auto", rerun_if_slow=None):
        # prewarm (warm mode only): "self" = one untimed fn() run,
        # "graphs" = graph caches only, "none" = measure truly cold
        # (the graph_build entries — their point is the cold build)
        if only is not None and name not in only:
            return
        if prewarm == "auto":
            prewarm = "self" if repeat else "graphs"
        if mode == "warm":
            # drop OTHER entries' leftover memo frames first: executor
            # memory pressure from dozens of earlier persisted frames
            # can evict this entry's just-warmed blocks mid-measurement
            # (the r08→r09 outlier mechanism).  The graph cache stays —
            # "index once, query many" is the measured contract.
            from matcha_spark.cache import clear_memo

            clear_memo()
            if prewarm == "self":
                fn()
            elif prewarm == "graphs":
                prewarm_graphs()
        dts = []
        for _ in range(runs if repeat else 1):
            if mode == "cold":
                clear_caches()
            t0 = time.time()
            fn()
            dts.append(time.time() - t0)
        # r14 (verdict ask #5): single-run entries whose one shot came
        # back slow are first-codegen-dominated — their round-over-round
        # deltas were noise.  One extra timed run (min-of-2) costs ~the
        # threshold per slow entry and makes the committed number
        # steady-state instead of compile-bound.
        if rerun_if_slow is not None and not repeat and dts[0] > rerun_if_slow:
            t0 = time.time()
            fn()
            dts.append(time.time() - t0)
        dts.sort()
        times[name] = round(dts[0], 3)
        mid = (
            dts[len(dts) // 2]
            if len(dts) % 2
            else (dts[len(dts) // 2 - 1] + dts[len(dts) // 2]) / 2
        )
        spread[name] = {
            "min": round(dts[0], 3),
            "median": round(mid, 3),
            "max": round(dts[-1], 3),
            "n": len(dts),
        }

    # warm the session first: JVM startup + first-job scheduling + first
    # parquet footer read cost ~5s and belong to the harness, not to
    # whichever query happens to run first.  r19: warm EVERY fixture
    # table's footer/schema (via load_tables, which memoizes the
    # inferred schema), not just region's — the first timed entry is
    # the cold graph build, and the dimension tables' driver-side
    # schema inference (~85 ms each) is exactly the harness cost this
    # block was documented to absorb
    spark.range(1_000_000).count()
    load_tables(spark, SF_DIR)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    # --- graph build (cached once, like index-triples; timed cold) ---
    bench("graph_build", lambda: _graph(spark, SF_DIR).df.count(), repeat=False, prewarm="none")
    bench(
        "graph_build_orders",
        lambda: _graph(
            spark, SF_DIR, include_orders=True, order_priority="1-URGENT"
        ).df.count(),
        repeat=False,
        prewarm="none",
    )

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]

    # --- headline queries ---
    bench("q1_pricing_summary", lambda: force(R.q1_pricing_summary(spark, SF_DIR)))
    bench("q3_top_revenue", lambda: force(R.q3_top_unshipped_revenue(spark, SF_DIR)))
    bench("q5_nation_revenue", lambda: force(R.q5_nation_revenue(spark, SF_DIR)))
    bench("q6_forecast_revenue", lambda: force(R.q6_forecast_revenue(spark, SF_DIR)))
    # TPC-H completion (r07) — one per distinctive plan shape: 8-way
    # dim-pruned join (q8), returned-items top-k (q10), left-outer double
    # agg (q13), distinct-count agg (q16), pre-agg⋈fact (q18),
    # decorrelated exists/not-exists (q21)
    bench("q8_market_share", lambda: force(R.q8_market_share(spark, SF_DIR)))
    bench("q10_returned_items", lambda: force(R.q10_returned_items(spark, SF_DIR)))
    bench("q13_customer_distribution", lambda: force(R.q13_customer_distribution(spark, SF_DIR)))
    bench("q16_supplier_part_counts", lambda: force(R.q16_supplier_part_counts(spark, SF_DIR)))
    bench("q18_large_volume_customers", lambda: force(R.q18_large_volume_customers(spark, SF_DIR)))
    bench("q21_waiting_suppliers", lambda: force(R.q21_waiting_suppliers(spark, SF_DIR)))
    bench("topk_orders_per_customer", lambda: force(R.topk_orders_per_customer(spark, SF_DIR)))
    bench("events_sessionize", lambda: force(R.events_sessionize(spark, SF_DIR)))
    bench("events_sessionize_native", lambda: force(R.events_sessionize_native(spark, SF_DIR)))
    bench("events_funnel", lambda: force(R.events_funnel(spark, SF_DIR)))
    bench("bgp_scan_all", lambda: force(
        select_df(["?s", "?p", "?o"], [("?s", "?p", "?o")], _graph(spark, SF_DIR))
    ))
    bench("bgp_customers_in_region", lambda: force(bgp_customers_in_region(spark, SF_DIR)))
    bench("bgp_optional_urgent_orders", lambda: force(bgp_optional_urgent_orders(spark, SF_DIR)))
    bench("bgp_path_region_members", lambda: force(bgp_path_region_members(spark, SF_DIR)))
    # closure entries materialize path-doubling rounds EVERY call (no
    # result reuse across runs), so min-of-N is honest — and these
    # multi-job iterative entries are the jitter-prone ones, so the
    # repetition is what makes their numbers comparable across rounds
    bench("bgp_path_reach_urgent", lambda: force(bgp_path_reach_urgent(spark, SF_DIR)), prewarm="graphs")
    bench("graph_closure_nations", lambda: force(graph_closure_nations(spark, SF_DIR)), prewarm="graphs")
    bench("asof_events_orders", lambda: force(R.asof_events_orders(spark, SF_DIR)))
    bench("asof_events_orders_forward", lambda: force(R.asof_events_orders_forward(spark, SF_DIR)))
    bench("rollup_nation_segment", lambda: force(R.rollup_nation_segment(spark, SF_DIR)))
    bench("cube_priority_status", lambda: force(R.cube_priority_status(spark, SF_DIR)))
    bench("doc_strip_boilerplate", lambda: force(T.strip_boilerplate(docs)))
    bench("doc_media_features", lambda: force(doc_media_features(spark, SF_DIR)))
    bench("dedup_exact_docs", lambda: force(T.dedup_exact(docs)))
    bench("doc_minhash_lsh", lambda: force(D.minhash_lsh_candidates(docs)))
    bench("doc_simhash_pairs", lambda: force(D.simhash_candidates(docs)))
    bench("dedup_near_lsh", lambda: force(D.dedup_near_docs_lsh(docs)))
    bench("doc_token_count", lambda: force(T.token_count(docs)))
    bench("doc_sample_hash", lambda: force(T.sample_hash(docs, 0.25)))
    bench("doc_tfidf_top", lambda: force(T.tfidf_top_terms(docs, k=3)))
    bench("doc_bm25_search", lambda: force(T.bm25_search(docs, ["spark", "table", "sort"])))
    bench("emb_cosine_topk", lambda: force(
        S.cosine_topk(emb, emb.where("vec_id < 5"), k=5)
    ))
    bench("emb_lsh_topk", lambda: force(
        S.lsh_bucketed_topk(emb, emb.where("vec_id < 5"), k=5)
    ))
    bench("emb_dup_pairs", lambda: force(D.embedding_dup_pairs(emb, threshold=0.4)))
    # r07 additions: curation + query-surface coverage
    bench("doc_dup_ngrams", lambda: force(T.dup_ngram_stats(docs, n=5)))
    bench("doc_cdc_chunks", lambda: force(T.cdc_chunks(docs, avg_size=64)))
    bench("emb_semdedup", lambda: force(D.semdedup(emb, threshold=0.4, n_clusters=8)))
    bench("doc_image_phash", lambda: force(doc_image_phash(spark, SF_DIR)))
    bench("doc_contamination", lambda: force(doc_contamination(spark, SF_DIR)))
    # r18 (verdict ask #7): the Bloom decontamination path gets its own
    # per-round trend entry — the suite entry runs BOTH arms (exact +
    # bloom) plus the soundness booleans, so this watermarks the whole
    # 100-TB shape, not just the bit-table probe
    bench("doc_contamination_bloom",
          lambda: force(doc_contamination_bloom(spark, SF_DIR)))
    bench("doc_unigram_logloss", lambda: force(doc_unigram_logloss(spark, SF_DIR)))
    bench("doc_pipeline_curate", lambda: force(doc_pipeline_curate(spark, SF_DIR)))
    bench("doc_strip_dup_ngrams", lambda: force(T.strip_dup_ngrams(docs, n=5)))
    bench("emb_pq_topk", lambda: force(
        S.pq_topk(emb, emb.where("vec_id < 5"), k=5)
    ))
    bench("emb_ivfpq_topk", lambda: force(
        S.ivfpq_topk(emb, emb.where("vec_id < 5"), k=5, n_centroids=8, n_probe=4)
    ))
    bench("bgp_agg_customers_by_region", lambda: force(bgp_agg_customers_by_region(spark, SF_DIR)))
    bench("graph_shortest_urgent", lambda: force(graph_shortest_urgent(spark, SF_DIR)), prewarm="graphs")
    # LSH near-dup benched in its design regime (high-cosine dups, tight
    # buckets); at wide angles the bucket join floods and exact wins
    bench("emb_dup_lsh", lambda: force(D.embedding_dup_pairs_lsh(emb, threshold=0.9)))
    # r08 additions: curation, packing, skew, paths, radius search
    from matcha_spark.suite import (
        bgp_agg_top_urgent_nations,
        bgp_bind_term_functions,
        bgp_minus_machinery_asia,
        bgp_path_zom_region,
        doc_bpe_pretokens,
        doc_dedup_paragraphs,
        doc_dsir_weights,
        emb_range_search,
        graph_shortest_weighted,
    )

    bench("doc_dedup_paragraphs", lambda: force(doc_dedup_paragraphs(spark, SF_DIR)))
    bench("doc_dsir_weights", lambda: force(doc_dsir_weights(spark, SF_DIR)))
    bench("doc_token_windows", lambda: force(T.token_windows(docs, size=16, stride=8)))
    bench("emb_range_search", lambda: force(emb_range_search(spark, SF_DIR)))
    bench("events_salted_type_stats", lambda: force(R.events_salted_type_stats(spark, SF_DIR)))
    bench("events_transition_matrix", lambda: force(R.events_transition_matrix(spark, SF_DIR)))
    bench("bgp_path_zom_region", lambda: force(bgp_path_zom_region(spark, SF_DIR)))
    bench("bgp_agg_top_urgent_nations", lambda: force(bgp_agg_top_urgent_nations(spark, SF_DIR)))
    bench("bgp_minus_machinery_asia", lambda: force(bgp_minus_machinery_asia(spark, SF_DIR)))
    bench("bgp_bind_term_functions", lambda: force(bgp_bind_term_functions(spark, SF_DIR)))
    bench("doc_bpe_pretokens", lambda: force(doc_bpe_pretokens(spark, SF_DIR)))
    from matcha_spark.suite import doc_strip_html, doc_video_near_dup

    bench("doc_strip_html", lambda: force(doc_strip_html(spark, SF_DIR)))
    bench("events_funnel_windowed", lambda: force(R.events_funnel_windowed(spark, SF_DIR)))
    bench("doc_video_near_dup", lambda: force(doc_video_near_dup(spark, SF_DIR)), repeat=False)
    from matcha_spark.suite import doc_audio_near_dup

    bench("doc_audio_near_dup", lambda: force(doc_audio_near_dup(spark, SF_DIR)), repeat=False)
    bench("graph_shortest_weighted", lambda: force(graph_shortest_weighted(spark, SF_DIR)), prewarm="graphs")
    # r09 additions: seeded ground-endpoint evaluation (O(reachable)
    # frontier BFS vs the all-pairs closures above) + SimHash store dedup
    from matcha_spark.suite import (
        bgp_path_from_seed,
        dedup_incremental_simhash,
        graph_distances_from_seed,
    )

    bench("bgp_path_from_seed", lambda: force(bgp_path_from_seed(spark, SF_DIR)), prewarm="graphs")
    # r10: same reachability cone, but the seed arrives via a selective
    # name pattern — exercises the deferred seeded-closure join path
    from matcha_spark.suite import bgp_path_from_selective_var

    bench("bgp_path_from_selective_var", lambda: force(bgp_path_from_selective_var(spark, SF_DIR)), prewarm="graphs")
    bench("graph_distances_from_seed", lambda: force(graph_distances_from_seed(spark, SF_DIR)), prewarm="graphs")
    bench("dedup_incremental_simhash", lambda: force(dedup_incremental_simhash(spark, SF_DIR)))
    from matcha_spark.suite import doc_chunk_packing

    bench("doc_chunk_packing", lambda: force(doc_chunk_packing(spark, SF_DIR)))
    # r10: deterministic global shuffle — same two-phase distributed
    # rank shape as chunk_packing's prefix sum
    bench("doc_corpus_shuffle", lambda: force(T.corpus_shuffle(docs)))
    from matcha_spark.suite import (
        bgp_exists_repeat_customers,
        bgp_select_top_names,
        bgp_subquery_busy_nations,
    )

    bench("bgp_select_top_names", lambda: force(bgp_select_top_names(spark, SF_DIR)))
    bench("bgp_subquery_busy_nations", lambda: force(bgp_subquery_busy_nations(spark, SF_DIR)))
    bench("bgp_exists_repeat_customers", lambda: force(bgp_exists_repeat_customers(spark, SF_DIR)))
    # r11 additions: tokenizer packing, incremental embedding dedup,
    # zero-seam video pipeline, salted length batching
    from matcha_spark.suite import (
        doc_bpe_pack,
        doc_video_pipeline,
        emb_semdedup_incremental,
    )

    bench("doc_bpe_pack", lambda: force(doc_bpe_pack(spark, SF_DIR)))
    bench("emb_semdedup_incremental", lambda: force(emb_semdedup_incremental(spark, SF_DIR)))
    # repeat=True: the untimed warming run synthesizes + memoizes the
    # PNG-in-MP4 corpus (a real pipeline READS containers, it doesn't
    # encode them); the timed runs measure the actual dedup path —
    # demux -> PNG decode -> pHash -> banded pairs
    bench("doc_video_pipeline", lambda: force(doc_video_pipeline(spark, SF_DIR)))
    from matcha_spark.suite import doc_video_mjpeg

    bench("doc_video_mjpeg", lambda: force(doc_video_mjpeg(spark, SF_DIR)))
    bench("doc_length_batches", lambda: force(T.length_batches(docs, bucket_width=16, batch_size=8)))
    bench("doc_bigram_logloss", lambda: force(T.bigram_logloss(docs)))
    from matcha_spark.suite import graph_triangles_parts

    bench("graph_triangles_parts", lambda: force(graph_triangles_parts(spark, SF_DIR)))
    from matcha_spark.suite import graph_kcore_sound

    bench("graph_kcore_sound", lambda: force(graph_kcore_sound(spark, SF_DIR)))
    # --- r12 entries ---
    from matcha_spark.suite import (
        dedup_near_lsh_sound,
        doc_flac_features,
        doc_minhash_recall_sound,
        emb_ivf_recall_sound,
        emb_lsh_recall_sound,
        emb_pq_recall_sound,
        graph_kcore_max,
    )

    # r13: the k-core pair shares one memoized coreness fixpoint
    # (suite._coorder_coreness), so the pair's entries measure their
    # own joins/slices over the cached assignment (~0.5 s) — honest for
    # the suite, but it would leave the most expensive iterative
    # operator without a committed number.  This bench-only entry
    # evicts the co-order cache keys and times the fixpoint cold.
    def _kcore_fixpoint():
        from matcha_spark.suite import _GRAPH_CACHE, _coorder_coreness

        for key in [
            k
            for k in list(_GRAPH_CACHE)
            if isinstance(k, tuple) and str(k[-1]).startswith("__coorder")
        ]:
            _GRAPH_CACHE.pop(key).unpersist()
        force(_coorder_coreness(spark, SF_DIR)[1])

    bench("graph_kcore_fixpoint", _kcore_fixpoint, repeat=False, prewarm="none")
    bench("graph_kcore_max", lambda: force(graph_kcore_max(spark, SF_DIR)))
    bench("doc_flac_features", lambda: force(doc_flac_features(spark, SF_DIR)))
    bench("emb_lsh_recall_sound", lambda: force(emb_lsh_recall_sound(spark, SF_DIR)))
    bench("emb_ivf_recall_sound", lambda: force(emb_ivf_recall_sound(spark, SF_DIR)))
    bench("emb_pq_recall_sound", lambda: force(emb_pq_recall_sound(spark, SF_DIR)))
    bench("doc_minhash_recall_sound", lambda: force(doc_minhash_recall_sound(spark, SF_DIR)))
    bench("dedup_near_lsh_sound", lambda: force(dedup_near_lsh_sound(spark, SF_DIR)))

    # --- r14 entries ---
    # doc_dup_spans is rows-only (never windowed) and its oracle twin
    # is a _planted exclusion, so the span family's committed number
    # lives here: the full plant + CDC chunk + spans + scrub pipeline.
    # dedup_keep_best_docs auto-benches once its holdback publishes
    # into the r15 window; until then the tuned slot keeps the new
    # argmax path measured.
    from matcha_spark.suite import dedup_keep_best_docs, doc_dup_spans

    # the span pair shares a memoized spans frame (_dup_spans_frames);
    # evict it so the number is the full chunk+spans+scrub pipeline,
    # not the cached summary joins (same honesty rule as
    # graph_kcore_fixpoint above)
    def _dup_spans_cold():
        from matcha_spark.suite import _GRAPH_CACHE

        for key in [
            k
            for k in list(_GRAPH_CACHE)
            if isinstance(k, tuple) and str(k[-1]) == "__dup_spans"
        ]:
            _GRAPH_CACHE.pop(key).unpersist()
        force(doc_dup_spans(spark, SF_DIR))

    bench("doc_dup_spans", _dup_spans_cold, repeat=False, prewarm="none")
    bench(
        "dedup_keep_best_docs",
        lambda: force(dedup_keep_best_docs(spark, SF_DIR)),
    )
    from matcha_spark.suite import doc_winnow_pairs

    bench("doc_winnow_pairs", lambda: force(doc_winnow_pairs(spark, SF_DIR)))

    # --- auto coverage (r13, verdict ask #5) --------------------------
    # Every entry in the CURRENT driver window (the first 50 of
    # QUERIES) not hand-benched above gets ONE timed run, so each
    # round's correctness window carries committed wall-times and a
    # plan regression shows up as a bench delta instead of being
    # invisible until it breaks.  Window-scoped, not whole-registry:
    # the window rotates over every oracle-backed entry within 3
    # rounds, so coverage follows the rotation while the bench stays
    # inside the per-round budget (a full-registry sweep measured >10
    # min at sf0.1 — entries outside the window are the documented
    # exclusion, each no more than 3 rounds from its next number).
    # Single-run, no self-prewarm: coarser than the tuned entries
    # above (first-codegen cost included); promote an entry to the
    # tuned list when its number needs to be load-bearing.  Entries
    # whose single shot exceeds 2 s get one extra run (min-of-2,
    # r14 verdict ask #5) so slow-entry numbers aren't compile-bound.
    # Documented exclusion: derived-invariant twins (_planted/_sound/
    # _stable/_tolerance) re-run their underlying operator plus a
    # filter or an exact reference pass — the operator itself is the
    # benched surface, and double-running the most expensive family
    # members (video/audio near-dup, recall certifications) is what
    # pushed the sweep past the per-round budget.  A twin whose cost
    # diverges from its base operator belongs in the tuned list.
    from matcha_spark.suite import QUERIES

    _TWIN_SUFFIXES = ("_planted", "_sound", "_stable", "_tolerance")
    for _name in list(QUERIES)[:50]:
        if _name in times or _name.endswith(_TWIN_SUFFIXES):
            continue
        bench(
            _name,
            (lambda f: lambda: force(f(spark, SF_DIR)))(QUERIES[_name]),
            repeat=False,
            prewarm="none",
            rerun_if_slow=2.0,
        )

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    payload = {
        "metric": "matcha_spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "mode": mode,
        "runs": runs,
        "only": sorted(only) if only is not None else None,
        "full": "bench_last.json",
        "spread": spread,
        # queries LAST: the driver preserves only the trailing 2 KB of
        # stdout, so the per-entry numbers sit at the end of the line
        # (BENCH_r11's recorded tail began mid-JSON — the suite outgrew
        # the capture window)
        "queries": times,
    }
    # the complete payload also lands in-repo: the driver commits
    # uncommitted work at round close, so its own run's numbers — full
    # per-entry times AND min/median/max spread — survive intact even
    # when the stdout tail truncates
    if only is None:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_last.json"),
            "w",
        ) as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))
    # The driver keeps only the trailing 2000 chars of stdout and tries
    # to parse a JSON line from them; the full payload outgrew that
    # window rounds ago (BENCH_r12 recorded parsed: None).  Emit a
    # final COMPACT line — headline metric + a handful of flagship
    # per-query numbers — that always fits the capture window whole;
    # the complete per-entry payload lives in bench_last.json above.
    headline = [
        "graph_build", "bgp_scan_all", "bgp_customers_in_region",
        "q1_pricing_summary", "q5_nation_revenue", "events_sessionize_native",
        "dedup_exact_docs", "dedup_near_lsh", "emb_cosine_topk",
        "emb_lsh_topk", "doc_pipeline_curate", "graph_kcore_fixpoint",
    ]
    compact = dict(payload)
    compact.pop("spread", None)
    compact["queries"] = {k: times[k] for k in headline if k in times}
    compact["n_queries_total"] = len(times)
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
