"""Composed curation pipelines: the individual operators wired the way
a production corpus build runs them, with a per-document audit trail.

The composition is itself correctness-gated: the suite entry
``doc_pipeline_curate`` replays the full quality → dedup →
decontamination cascade as one DuckDB SQL query and hash-compares the
per-document verdicts — catching stage-ordering and survivor-set bugs
that per-operator oracles cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import text as T

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    probes: DataFrame | None = None,
    min_tokens: int = 5,
    max_avg_token_len: float = 12.0,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
    contamination_n: int = 8,
    max_contamination: float = 0.5,
    text_col: str = "text",
    blocked_domains: DataFrame | list | None = None,
    url_dedup: bool = False,
    url_col: str = "url",
    dedup_method: str = "exact",
    dedup_kwargs: dict | None = None,
    survivor_score=None,
) -> DataFrame:
    """Standard curation cascade with an audit verdict per document:

    0. **blocked_domain** / **url_duplicate** (both OPTIONAL, default
       off — the default cascade is byte-identical without them): the
       crawl-pipeline URL head (:mod:`operators.web`) — suffix-aware
       domain blocklist when ``blocked_domains`` is given, then
       keep-one per canonical URL when ``url_dedup=True`` (min doc_id
       among blocklist survivors; requires ``url_col``);
    1. **quality**: Gopher/C4-style signal gate (:func:`text.quality_filter`
       thresholds);
    2. **duplicate**: content dedup among quality survivors —
       ``dedup_method="exact"`` (the default: :func:`text.dedup_exact`
       semantics, normalized-text md5 groups, min doc_id kept; the
       audited byte-identical path), ``"simhash"`` (banded Hamming
       candidates → connected components → min-id keeper;
       ``dedup_kwargs={"max_hamming": ...}``), or ``"lsh"``
       (MinHash+LSH candidates with exact-Jaccard verification;
       ``dedup_kwargs={"threshold": ...}``) — the same near-dup choice
       the streaming twin (``streaming.curate.stream_curate``) offers.
       ``survivor_score`` (optional Column over the input rows) turns
       every dedup method's keeper into the quality-ranked
       ``keep_best_map`` choice — each duplicate group keeps its
       highest-scoring member (ties toward the smaller id) instead of
       the smallest id, the CCNet-style selection;
    3. **contaminated**: benchmark n-gram overlap above
       ``max_contamination`` among remaining docs (skipped when
       ``probes`` is None).

    Output: ``(doc_id, status)`` for EVERY input document — ``kept`` or
    the first stage that rejected it (``blocked_domain`` /
    ``url_duplicate`` / ``quality`` / ``duplicate`` / ``contaminated``)
    — the audit table a pipeline owner reports on.

    Each stage runs only on the previous stage's survivors (a rejected
    duplicate can't knock out a later doc, and dedup groups form among
    quality survivors only — the ordering production pipelines use so
    junk never shadows good copies; the URL stages run FIRST because
    they gate on ~100-byte keys before any text is touched).  Plan: the
    signal/gate stages are codegen'd column work; dedup is one
    hash-groupBy (url and content); the blocklist is a broadcast join;
    contamination is a broadcast-probe semi-match — nothing pairwise,
    nothing collected."""
    url_ok = None
    url_keep = None
    if blocked_domains is not None or url_dedup:
        from .operators import web as W
    if blocked_domains is not None:
        url_ok = W.domain_blocklist_filter(
            docs.select("doc_id", url_col), blocked_domains, url_col=url_col
        ).select("doc_id")
    if url_dedup:
        pool = docs.select("doc_id", url_col)
        if url_ok is not None:
            pool = pool.join(url_ok, "doc_id", "left_semi")
        url_keep = (
            pool.select("doc_id", W.url_normalize(url_col).alias("__u"))
            .groupBy("__u")
            .agg(F.min("doc_id").alias("keep_id"))
            .select(F.col("keep_id").alias("doc_id"))
        )
    quality_ok = T.quality_filter(
        docs,
        min_tokens=min_tokens,
        max_avg_token_len=max_avg_token_len,
        max_punct_ratio=max_punct_ratio,
        min_stopword_ratio=min_stopword_ratio,
        text_col=text_col,
    ).select("doc_id")
    if survivor_score is not None:
        # evaluated on the FULL input schema (a score may reference any
        # input column, e.g. a quality-classifier output), and ONCE, so
        # it also survives the lsh path's column rename below
        base = docs.select("doc_id", text_col, survivor_score.alias("__kb_score"))
    else:
        base = docs.select("doc_id", text_col)
    for gate in (url_ok, url_keep):
        if gate is not None:
            base = base.join(gate, "doc_id", "left_semi")
    q_surv = base.join(quality_ok, "doc_id", "left_semi")

    if dedup_method == "exact":
        norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
        fp = q_surv.select(
            "doc_id",
            F.md5(norm).alias("__fp"),
            *(["__kb_score"] if survivor_score is not None else []),
        )
        if survivor_score is None:
            keep_id = F.min("doc_id").alias("keep_id")
        else:
            keep_id = (
                -F.max(
                    F.struct(
                        F.col("__kb_score").alias("s"),
                        (-F.col("doc_id")).alias("nid"),
                    )
                )["nid"]
            ).alias("keep_id")
        keepers = (
            fp.groupBy("__fp").agg(keep_id)
            .select(F.col("keep_id").alias("doc_id"))
        )
    elif dedup_method in ("simhash", "lsh"):
        from .operators.dedup import (
            connected_components,
            dedup_near_docs_lsh,
            keep_best_map,
            simhash_candidates,
        )

        if dedup_method == "simhash":
            pairs = simhash_candidates(
                q_surv, text_col=text_col, **(dedup_kwargs or {})
            )
            comp = connected_components(pairs)
            if survivor_score is not None:
                km = keep_best_map(q_surv, comp, "__kb_score")
            else:
                km = q_surv.select("doc_id").join(
                    comp, F.col("doc_id") == F.col("id"), "left"
                ).select(
                    "doc_id",
                    F.coalesce("component", F.col("doc_id")).alias("keep_doc_id"),
                )
        else:
            # the LSH path's shingle pipeline reads the default text
            # column; rename so a text_col override reaches it too
            km = dedup_near_docs_lsh(
                q_surv.select(
                    "doc_id",
                    F.col(text_col).alias("text"),
                    *(["__kb_score"] if survivor_score is not None else []),
                ),
                **dict(
                    (dedup_kwargs or {}),
                    **(
                        {"score": F.col("__kb_score")}
                        if survivor_score is not None
                        else {}
                    ),
                ),
            )
        keepers = km.where(F.col("doc_id") == F.col("keep_doc_id")).select(
            "doc_id"
        )
    else:
        raise ValueError(
            f"dedup_method must be exact|simhash|lsh, got {dedup_method!r}"
        )
    d_surv = q_surv.join(keepers, "doc_id", "left_semi")

    if probes is not None:
        cont = T.benchmark_contamination(
            d_surv, probes, n=contamination_n, text_col=text_col
        )
        contaminated = cont.where(
            F.col("contamination") > max_contamination
        ).select("doc_id")
    else:
        contaminated = d_surv.select("doc_id").limit(0)

    # the when-chain starts at the module (F.when) and extends per
    # enabled URL stage — first matching stage names the verdict
    st = docs.select("doc_id")
    verdict: object = F
    if url_ok is not None:
        st = st.join(url_ok.withColumn("__b", F.lit(1)), "doc_id", "left")
        verdict = verdict.when(F.col("__b").isNull(), "blocked_domain")
    if url_keep is not None:
        st = st.join(url_keep.withColumn("__u", F.lit(1)), "doc_id", "left")
        verdict = verdict.when(F.col("__u").isNull(), "url_duplicate")
    status = (
        st
        .join(quality_ok.withColumn("__q", F.lit(1)), "doc_id", "left")
        .join(keepers.withColumn("__k", F.lit(1)), "doc_id", "left")
        .join(contaminated.withColumn("__c", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            verdict.when(F.col("__q").isNull(), "quality")
            .when(F.col("__k").isNull(), "duplicate")
            .when(F.col("__c").isNotNull(), "contaminated")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return status
