"""Streaming curation: the :func:`matcha_spark.pipelines.curate_corpus`
cascade lifted onto Structured Streaming — one ``foreachBatch`` that
admits each micro-batch of crawled documents against PERSISTED corpus
state, emitting the same per-document verdict contract as the batch
pipeline.

Stages per micro-batch, in the batch pipeline's order (first failing
stage names the verdict):

1. ``blocked_domain`` — static suffix-aware blocklist (broadcast join);
2. ``url_duplicate`` — canonical URL vs the persisted ``(key, keeper)``
   url store; within a batch the min id wins, store wins over batch;
3. ``quality`` — the per-row Gopher/C4 signal gate;
4. ``duplicate`` — content dedup vs persisted state: ``"exact"`` keys
   an md5 of normalized text into a second seen-key store (byte-parity
   with the batch pipeline's dedup stage), ``"simhash"``/``"minhash"``
   run the incremental near-dup admission against a signature store;
5. ``kept``.

State layout under ``store_path``: ``url_keys/`` and ``fp_keys/``
(seen-key stores), ``fp_cands/`` (per-key best-candidate ledger —
written only with ``dedup_rank``, one row per distinct key per batch,
pruned to one row per key at compaction), ``sigs/`` (signature store
for the near methods), ``sig_cands/`` (the near modes' best-candidate
ledger — ``(key, cand, rank, <signature cols>)``, key = the group
representative the arrival deduped against; written only with
``dedup_rank``), ``keeper_map/`` (``(old, new)`` keeper
displacements emitted by compactions in EVERY dedup mode, kept
transitively composed so emitted ``dup_of`` edges resolve in one
lookup — :func:`resolve_keepers`),
``_batches/`` (the shared replay ledger — one append per store per
batch, guarded by batch id exactly as in :mod:`streaming.dedup`).

Semantics mirror the batch cascade deliberately: URL groups form among
blocklist survivors (a quality-rejected doc still claims its URL —
refetches of junk are still refetches), and content-dedup groups form
among quality survivors only (junk never shadows a good copy).  With
``dedup="exact"`` a single batch produces verdicts IDENTICAL to
``curate_corpus`` on the same rows — pinned by a differential test.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    _compact_store,
    _ledger_probe,
    _read_if_exists,
    _recover_store,
)

__all__ = ["resolve_keepers", "stream_curate"]


def resolve_keepers(decisions: DataFrame, store_path: str,
                    col: str = "dup_of",
                    status_col: str = "status") -> DataFrame:
    """Resolve an arrival-log keeper column to CURRENT group
    representatives (r17, the consumer side of the near-mode
    keeper map): one left join against ``keeper_map/`` — the
    compaction pass keeps the map transitively composed, so a single
    lookup suffices no matter how many displacements a group has seen.
    Rows whose keeper was never displaced pass through unchanged; a
    displaced keeper's own arrival row resolves to the new
    representative (reading "this group is now represented by X").
    Every dedup mode's compaction emits the map (exact mode since r17,
    parity with the near modes); with no map on disk (no displacement
    yet, or a rank-less store) the frame is returned as-is.

    The map covers CONTENT-dedup edges only (r18 advice): url groups
    are never re-decided, so when ``status_col`` is present only rows
    with status ``"duplicate"`` are rewritten — a doc that is both a
    URL-group keeper and a later-displaced content representative
    keeps its ``url_duplicate`` edges pointing at the URL keeper.
    Pass ``status_col=None`` for a bare (id, keeper) frame with no
    status column."""
    spark = decisions.sparkSession
    m = _read_if_exists(spark, os.path.join(store_path, "keeper_map"))
    if m is None:
        return decisions
    m = m.select(F.col("old").alias("__o"), F.col("new").alias("__n"))
    repl = F.coalesce("__n", col)
    if status_col is not None and status_col in decisions.columns:
        repl = F.when(
            F.col(status_col) == "duplicate", repl
        ).otherwise(F.col(col))
    return (
        decisions.join(m, decisions[col] == m["__o"], "left")
        .withColumn(col, repl)
        .drop("__o", "__n")
    )


def _cand_argmax(cands):
    """Global best candidate per key — rank desc (NULLs lowest), min id
    among ties: the cross-batch extension of :func:`_seen_stage`'s
    batch argmax.  The argmax of per-batch bests equals the argmax of
    every recorded doc (max of maxes; min-id tie-break composes), so
    pruning the candidate store to one row per key between compactions
    is lossless AND keeps it bounded by #distinct-keys, not #docs."""
    w = Window.partitionBy("key").orderBy(
        F.col("rank").desc_nulls_last(), F.col("cand").asc()
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _write_keeper_map(spark, map_dir: str, wmap) -> None:
    """Append this compaction's ``(old, new)`` displacements to the
    keeper map, keeping it TRANSITIVELY COMPOSED (a ``c -> d`` swap
    rewrites earlier ``k -> c`` rows to ``k -> d``) so
    :func:`resolve_keepers` needs one lookup.  Idempotent under
    re-application of the same ``wmap``: within one compaction the
    old and new sets are disjoint (a winning candidate was never a
    representative), so re-composing changes nothing and the per-old
    collapse keeps the identical row.

    The first-ever write rides its own scratch+rename dance (r18
    advice #1): a bare ``write.parquet(map_dir)`` interrupted mid-write
    leaves a footer-less directory that every later read throws on —
    and because the batch's ledger row is already committed, replay
    never retries it.  Writing to ``map_dir + "._init"`` and renaming
    in means a crash leaves either nothing (retried at the next
    compaction from the same unrewritten stores) or a complete map.
    The ``._init`` suffix is deliberately NOT ``._compact``:
    :func:`_recover_store` trusts a ``._compact`` leftover as a
    known-complete copy, which a crashed first write is not."""
    prev = _read_if_exists(spark, map_dir)
    if prev is None:
        if wmap.limit(1).count() > 0:
            jvm = spark._jvm
            live = jvm.org.apache.hadoop.fs.Path(map_dir)
            tmp = jvm.org.apache.hadoop.fs.Path(map_dir + "._init")
            fs = live.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(tmp):
                fs.delete(tmp, True)
            wmap.write.parquet(str(tmp))
            if not fs.rename(tmp, live):
                raise IOError(f"keeper map: could not publish {map_dir}")
        return

    def _compose(m):
        # compose the existing rows through the fresh displacements,
        # then collapse to ONE row per old (r18 advice #3): a crash
        # between a map append and its companion store rewrite can
        # leave a stale (old -> x) whose x is neither a current keeper
        # nor in wmap's old set — union+distinct would let it sit
        # beside the fresh (old -> y) forever and fan resolve_keepers
        # out.  The freshly-derived wmap row wins its old; ties among
        # leftovers break to min new for determinism.
        wr = wmap.select(
            F.col("old").alias("__wo"), F.col("new").alias("__wn")
        )
        allrows = (
            m.join(wr, m["new"] == wr["__wo"], "left")
            .select(
                m["old"],
                F.coalesce("__wn", m["new"]).alias("new"),
                F.lit(0).alias("__pri"),
            )
            .unionByName(wmap.select("old", "new", F.lit(1).alias("__pri")))
        )
        w = Window.partitionBy("old").orderBy(
            F.col("__pri").desc(), F.col("new").asc()
        )
        return (
            allrows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__pri")
        )

    _compact_store(spark, map_dir, transform=_compose)


def _compact_redecide(spark, fp_keys_dir: str, fp_cands_dir: str,
                      map_dir: str | None = None) -> bool:
    """Compaction-time cross-batch keep-best re-decision (r16, verdict
    ask #2): re-run the score argmax over (stored keeper ∪ candidates
    recorded since — the keeper's own admission batch recorded it too)
    and rewrite ``fp_keys`` so a later higher-quality duplicate
    DISPLACES the sticky keeper.  Incumbent protection (r16 advice):
    a keeper with NO recorded candidate row of its own — the store
    predates ``dedup_rank``, or its admission batch ran rank-less —
    has an UNKNOWN rank, so no candidate can strictly outrank it and
    the key keeps its persisted keeper; re-deciding such keys by the
    candidates alone would let a later lower-quality duplicate win.
    Keepers admitted under ``dedup_rank`` always have their own row
    (their admission batch records them, and each compaction's pruned
    survivor IS the rewritten keeper), so the argmax path is unchanged
    in the normal case.  To rank-displace a pre-``dedup_rank`` store,
    rebuild it through the batch cascade.

    ``map_dir`` (r17, parity with the near modes): displacements are
    also appended to the composed keeper map BEFORE the store rewrite
    — the map derives only from the UNREWRITTEN (fp_keys, fp_cands)
    pair, so a crash at any point re-derives the same pairs (after
    the fp rewrite the new keeper's own row wins the argmax and the
    recomputed displacement set is empty — append-nothing, a no-op).
    All rewrites ride :func:`_compact_store`'s crash-safe rename
    dance with idempotent transforms.  Returns True when ``fp_keys``
    was rewritten (the caller skips its generic compaction pass for
    that dir)."""
    _recover_store(spark, fp_cands_dir)
    if map_dir is not None:
        _recover_store(spark, map_dir)
    if (
        _read_if_exists(spark, fp_cands_dir) is None
        or _read_if_exists(spark, fp_keys_dir) is None
    ):
        return False
    fp0 = spark.read.parquet(fp_keys_dir)
    cands = spark.read.parquet(fp_cands_dir)
    # keys whose stored keeper has a recorded row of its own: only
    # these are eligible for displacement (incumbent protection — an
    # unrecorded keeper's rank is unknown, nothing can strictly
    # outrank it).
    eligible = fp0.join(
        cands,
        (fp0["key"] == cands["key"]) & (fp0["keeper"] == cands["cand"]),
        "left_semi",
    ).select("key")
    best = (
        _cand_argmax(cands)
        .select("key", F.col("cand").alias("__new"))
        .join(eligible, "key", "left_semi")
    )
    if map_dir is not None:
        wmap = (
            fp0.join(best, "key")
            .where(F.col("__new") != F.col("keeper"))
            .select(
                F.col("keeper").alias("old"), F.col("__new").alias("new")
            )
        )
        _write_keeper_map(spark, map_dir, wmap)

    def _redecide(fp):
        return fp.join(best, "key", "left").select(
            "key", F.coalesce("__new", "keeper").alias("keeper")
        )

    _compact_store(spark, fp_keys_dir, transform=_redecide)
    _compact_store(spark, fp_cands_dir, transform=_cand_argmax)
    return True


def _compact_redecide_near(spark, sig_dir: str, cands_dir: str,
                           map_dir: str) -> bool:
    """Near-mode compaction-time keep-best re-decision (r17, verdict
    ask #4 — the exact-mode :func:`_compact_redecide` extended to the
    simhash/minhash signature store).  The store's group identity IS
    the representative's signature row, so displacing a keeper means
    swapping the row: remove the old representative's signature,
    insert the winning candidate's (recorded with its rank and
    signature in ``sig_cands/`` at arrival), and append the
    ``(old, new)`` displacement to ``keeper_map/`` — emitted
    ``dup_of`` edges stay an append-only arrival log, and the map
    resolves them to the current representative in one lookup (the
    map is kept transitively composed: a later ``c -> d`` swap
    rewrites earlier ``k -> c`` rows to ``k -> d``).

    Same incumbent protection as exact mode: only groups whose
    representative recorded its OWN candidate row (every ranked
    admission does; rank-less eras do not) are eligible — an
    unrecorded representative's rank is unknown, so nothing can
    strictly outrank it.  Ties break toward the smaller id, matching
    :func:`matcha_spark.operators.dedup.keep_best_map`.

    Crash safety: rewrites run sigs -> map -> cands, each riding
    :func:`_compact_store`'s rename dance with an idempotent
    transform; ``winners`` derives only from the UNREWRITTEN
    candidate store, so a crash between any two steps re-derives the
    same swaps and every step is a no-op where it already applied
    (anti-join insert on sigs, distinct on the map, match-nothing
    rekey on cands).

    Representative-probe scope (unchanged from the sticky era, now
    narrowed to between-compaction windows): arrivals dedup against
    the CURRENT representative's signature, so a swap can shift which
    borderline future docs match the group — the star-vs-component
    divergence the incremental family documents.  Returns True when
    the signature store was rewritten (the caller skips its generic
    compaction pass for ``sig_dir``)."""
    _recover_store(spark, cands_dir)
    _recover_store(spark, map_dir)
    if (
        _read_if_exists(spark, cands_dir) is None
        or _read_if_exists(spark, sig_dir) is None
    ):
        return False
    cands = spark.read.parquet(cands_dir)
    eligible = (
        cands.where(F.col("cand") == F.col("key")).select("key").distinct()
    )
    winners = (
        _cand_argmax(cands)
        .join(eligible, "key", "left_semi")
        .where(F.col("cand") != F.col("key"))
    )
    sigcols = [
        c for c in spark.read.parquet(sig_dir).columns if c != "doc_id"
    ]
    wmap = winners.select(
        F.col("key").alias("old"), F.col("cand").alias("new")
    )

    def _swap(sg):
        dead = winners.select(F.col("key").alias("doc_id"))
        add = winners.select(
            F.col("cand").alias("doc_id"), *sigcols
        ).join(sg.select("doc_id"), "doc_id", "left_anti")
        return sg.join(dead, "doc_id", "left_anti").unionByName(add)

    _compact_store(spark, sig_dir, transform=_swap)
    _write_keeper_map(spark, map_dir, wmap)

    def _rekey(cd):
        pruned = _cand_argmax(cd)
        wr = wmap.select(
            F.col("old").alias("__wo"), F.col("new").alias("__wn")
        )
        return (
            pruned.join(wr, pruned["key"] == wr["__wo"], "left")
            .withColumn("key", F.coalesce("__wn", "key"))
            .drop("__wo", "__wn")
        )

    _compact_store(spark, cands_dir, transform=_rekey)
    return True


def _seen_stage(batch, store, id_c="__id", key_c="__key", rank_c=None):
    """Shared seen-key admission frame: returns (joined, keep_col) —
    the same NULL-safe first-wins logic as ``streaming.keys``.

    ``rank_c`` (r15, keep-best): name of a rank column on ``batch`` —
    within the batch, each new key keeps its HIGHEST-ranked member
    (ties toward the min id; an all-NULL-rank group degrades to
    keep-first).  Keys already in the store stay with their persisted
    keeper regardless of rank.  Two-pass argmax (max rank per key,
    min id among maximizers) so string ids work."""
    if rank_c is None:
        batch_keep = (
            batch.where(F.col(key_c).isNotNull())
            .groupBy(key_c)
            .agg(F.min(id_c).alias("__bk"))
        )
    else:
        m = batch.where(F.col(key_c).isNotNull())
        mx = m.groupBy(key_c).agg(F.max(rank_c).alias("__mx"))
        batch_keep = (
            m.join(mx, key_c)
            .where(F.col(rank_c).eqNullSafe(F.col("__mx")))
            .groupBy(key_c)
            .agg(F.min(id_c).alias("__bk"))
        )
    joined = (
        batch.join(store, batch[key_c] == store["key"], "left")
        .join(batch_keep, key_c, "left")
    )
    keep = F.coalesce(
        F.col(key_c).isNull()
        | (F.col("keeper").isNull() & (F.col(id_c) == F.col("__bk")))
        | (F.col("keeper") == F.col(id_c)),
        F.lit(False),
    )
    return joined, keep


def stream_curate(
    docs_stream: DataFrame,
    store_path: str,
    decisions_sink: Callable[[DataFrame, int], None],
    blocked_domains: list | None = None,
    url_dedup: bool = False,
    url_col: str = "url",
    dedup: str = "exact",
    text_col: str = "text",
    quality_kwargs: dict | None = None,
    checkpoint_dir: str | None = None,
    compact_every: int = 64,
    dedup_rank=None,
    **dedup_kwargs,
):
    """Run the streaming curation cascade over a document stream.

    ``docs_stream``: streaming ``(doc_id, text[, url])`` frame (the
    WARC/JSONL sources produce it).  ``decisions_sink`` receives one
    ``(doc_id, status, dup_of)`` row per input document and the batch
    id — status ∈ {``blocked_domain``, ``url_duplicate``, ``quality``,
    ``duplicate``, ``kept``}; ``dup_of`` names the keeper for both
    duplicate classes, NULL otherwise.  ``dedup``: ``"exact"`` (md5
    seen-key store) or ``"simhash"`` / ``"minhash"`` (near-dup
    signature store; extra kwargs flow to the batch operator).

    Survivor selection is FIRST-ARRIVAL across batches by
    construction: admission against the persisted store decides each
    doc when it arrives and never revisits it — a later, better copy
    of an admitted document is a ``duplicate`` here, full stop.
    ``dedup_rank`` (r15, the bounded keep-best re-decision) narrows
    the gap to the batch cascade's quality-ranked ``survivor_score``:
    an optional Column over the input rows; WITHIN each micro-batch,
    duplicate groups keep their highest-ranked member (ties toward
    the smaller id; all-NULL groups degrade to keep-first) instead of
    the first by id.  BETWEEN compactions the CROSS-BATCH keeper
    stays sticky — rank re-decides survivors only inside their
    arrival batch, never against the persisted store, so decisions
    stay append-only and replay-idempotent.  On a single batch,
    ``dedup_rank`` reproduces ``curate_corpus(survivor_score=...)``
    verdicts exactly (differential-tested).

    AT compaction (every ``compact_every`` batches), the stickiness is
    repaired: each ranked batch also records its best candidate per
    group — ``fp_cands/`` in exact mode, ``sig_cands/`` (with the
    candidate's signature) in the near modes — and the compaction pass
    re-runs the score argmax over (stored keeper ∪ recorded
    candidates).  Exact mode rewrites ``fp_keys`` (r16, verdict ask
    #2; :func:`_compact_redecide`); the near modes swap the displaced
    representative's SIGNATURE row for the winner's (r17, verdict ask
    #4; :func:`_compact_redecide_near`).  Every mode appends its
    displacements to the composed ``keeper_map/``, so emitted
    ``dup_of`` edges — never retro-edited, the sink stays an
    append-only arrival log — resolve to the current representative
    in one :func:`resolve_keepers` lookup.  The
    STORE converges to the batch cascade's global keep-best: after a
    compaction, a fresh-checkpoint replay of the same data reproduces
    ``curate_corpus(survivor_score=...)`` verdicts exactly
    (differential-tested, exact mode), the near-mode survivor set
    equals the batch keep-best keepers on the same data
    (differential-tested), and post-compaction arrivals dedup against
    the re-decided keeper.

    Returns the started ``StreamingQuery``.  Replay-safe: all store
    appends are guarded by one batch-id ledger; exact-mode decisions
    are exactly idempotent under replay (seen-key keeper==id), near
    modes recompute deterministically as in ``stream_incremental_dedup``.

    Url-store migration caveat (r12 advice): ``url_dedup`` keys its
    seen-store on ``url_normalize`` output, whose DEFAULT strip list
    changed in r12 (``ref``/``ref_src`` no longer stripped).  A
    url-keys store built before that change will not match refetches
    differing only in a previously-stripped param — each such URL is
    re-admitted once.  Rebuild the store or see
    :func:`matcha_spark.operators.web.url_normalize` for the
    keep-old-keying override.
    """
    if dedup not in ("exact", "simhash", "minhash"):
        raise ValueError(f"dedup must be exact|simhash|minhash, got {dedup!r}")
    url_keys_dir = os.path.join(store_path, "url_keys")
    fp_keys_dir = os.path.join(store_path, "fp_keys")
    fp_cands_dir = os.path.join(store_path, "fp_cands")
    sig_dir = os.path.join(store_path, "sigs")
    sig_cands_dir = os.path.join(store_path, "sig_cands")
    keeper_map_dir = os.path.join(store_path, "keeper_map")
    ledger_dir = os.path.join(store_path, "_batches")
    qkw = dict(quality_kwargs or {})

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.text import quality_filter
        from ..operators.web import domain_blocklist_filter, url_normalize

        spark = batch_df.sparkSession
        ledger = _read_if_exists(spark, ledger_dir)
        already, n_led = _ledger_probe(
            ledger, batch_id, with_count=bool(compact_every)
        )
        docs = batch_df
        # --- stage 1: blocklist (static, no state) --------------------
        if blocked_domains is not None:
            not_blocked = domain_blocklist_filter(
                docs.select("doc_id", url_col), blocked_domains, url_col=url_col
            ).select("doc_id")
        else:
            not_blocked = docs.select("doc_id")
        surv = docs.join(not_blocked, "doc_id", "left_semi")

        # --- stage 2: url seen-store ---------------------------------
        url_keep_ids = surv.select("doc_id")
        new_url_keys = None
        if url_dedup:
            _recover_store(spark, url_keys_dir)
            ustore = _read_if_exists(spark, url_keys_dir)
            b = surv.select(
                F.col("doc_id").alias("__id"),
                url_normalize(url_col).alias("__key"),
            )
            if ustore is None:
                ustore = b.select(
                    F.col("__key").alias("key"), F.col("__id").alias("keeper")
                ).limit(0)
            joined, keep = _seen_stage(b, ustore)
            url_decisions = joined.select(
                F.col("__id").alias("doc_id"),
                keep.alias("__ukeep"),
                F.coalesce(F.col("keeper"), F.col("__bk")).alias("__udup"),
            )
            url_keep_ids = url_decisions.where("__ukeep").select("doc_id")
            new_url_keys = (
                joined.where(F.col("__key").isNotNull() & F.col("keeper").isNull())
                .select(
                    F.col("__key").alias("key"), F.col("__bk").alias("keeper")
                )
                .distinct()
            )
            surv = surv.join(url_keep_ids, "doc_id", "left_semi")
        else:
            url_decisions = None

        # --- stage 3: quality (per-row) ------------------------------
        q_ok = quality_filter(surv, text_col=text_col, **qkw).select("doc_id")
        q_surv = surv.join(q_ok, "doc_id", "left_semi")

        # --- stage 4: content dedup vs persisted state ----------------
        norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
        new_fp_keys = None
        new_fp_cands = None
        new_sig_cands = None
        kept_sigs = None
        if dedup == "exact":
            _recover_store(spark, fp_keys_dir)
            if dedup_rank is not None:
                _recover_store(spark, fp_cands_dir)
            fstore = _read_if_exists(spark, fp_keys_dir)
            b = q_surv.select(
                F.col("doc_id").alias("__id"),
                F.md5(norm).alias("__key"),
                *(
                    []
                    if dedup_rank is None
                    else [dedup_rank.alias("__rank")]
                ),
            )
            if fstore is None:
                fstore = b.select(
                    F.col("__key").alias("key"), F.col("__id").alias("keeper")
                ).limit(0)
            joined, keep = _seen_stage(
                b, fstore,
                rank_c=None if dedup_rank is None else "__rank",
            )
            dup_decisions = joined.select(
                F.col("__id").alias("doc_id"),
                keep.alias("__dkeep"),
                F.coalesce(F.col("keeper"), F.col("__bk")).alias("__ddup"),
            )
            new_fp_keys = (
                joined.where(F.col("__key").isNotNull() & F.col("keeper").isNull())
                .select(
                    F.col("__key").alias("key"), F.col("__bk").alias("keeper")
                )
                .distinct()
            )
            if dedup_rank is not None:
                # record this batch's best candidate per key (keepers
                # included — their admission batch records them) so the
                # compaction pass can re-run the argmax cross-batch.
                # One bounded append per batch: one row per DISTINCT
                # key in the batch, never per doc.
                m = b.where(F.col("__key").isNotNull())
                mxr = m.groupBy("__key").agg(F.max("__rank").alias("__mx"))
                new_fp_cands = (
                    m.join(mxr, "__key")
                    .where(F.col("__rank").eqNullSafe(F.col("__mx")))
                    .groupBy("__key")
                    .agg(
                        F.min("__id").alias("cand"),
                        F.first("__mx").alias("rank"),
                    )
                    .select(F.col("__key").alias("key"), "cand", "rank")
                )
        else:
            from ..operators.dedup import (
                incremental_dedup_near,
                incremental_dedup_simhash,
                minhash_signatures,
                simhash,
            )

            _recover_store(spark, sig_dir)
            if dedup_rank is not None:
                _recover_store(spark, sig_cands_dir)
            existing = _read_if_exists(spark, sig_dir)
            op = (
                incremental_dedup_simhash if dedup == "simhash"
                else incremental_dedup_near
            )
            dec, _ = op(
                q_surv, existing, text_col=text_col, rank=dedup_rank,
                **dedup_kwargs,
            )
            dup_decisions = dec.select(
                "doc_id",
                F.col("keep").alias("__dkeep"),
                F.col("dup_of").alias("__ddup"),
            )
            if dedup == "simhash":
                sig_new = simhash(q_surv, text_col=text_col)
            else:
                nh = dedup_kwargs.get("num_hashes", 64)
                sig_new = minhash_signatures(
                    q_surv, num_hashes=nh,
                    n=dedup_kwargs.get("n", 3), text_col=text_col,
                ).select("doc_id", *[f"h{i}" for i in range(nh)])
            kept_sigs = sig_new.join(
                dup_decisions.where(F.col("__dkeep")).select("doc_id"),
                "doc_id", "left_semi",
            )
            if dedup_rank is not None:
                # record this batch's best candidate per GROUP (key =
                # the representative each arrival deduped against;
                # kept docs key their own new group, so every ranked
                # representative records its own row) with its
                # signature, so the compaction pass can swap the
                # group's signature row to a later higher-ranked
                # arrival.  One row per distinct group per batch.
                grp = dec.select(
                    "doc_id", F.coalesce("dup_of", "doc_id").alias("key")
                ).join(
                    q_surv.select("doc_id", dedup_rank.alias("__rank")),
                    "doc_id",
                )
                mxr = grp.groupBy("key").agg(F.max("__rank").alias("__mx"))
                best = (
                    grp.join(mxr, "key")
                    .where(F.col("__rank").eqNullSafe(F.col("__mx")))
                    .groupBy("key")
                    .agg(
                        F.min("doc_id").alias("cand"),
                        F.first("__mx").alias("rank"),
                    )
                )
                new_sig_cands = best.join(
                    sig_new.withColumnRenamed("doc_id", "__sid"),
                    F.col("cand") == F.col("__sid"),
                ).drop("__sid")

        # --- verdicts: first failing stage wins -----------------------
        st = docs.select("doc_id")
        st = st.join(not_blocked.withColumn("__nb", F.lit(1)), "doc_id", "left")
        if url_decisions is not None:
            st = st.join(url_decisions, "doc_id", "left")
        st = st.join(q_ok.withColumn("__q", F.lit(1)), "doc_id", "left")
        st = st.join(dup_decisions, "doc_id", "left")
        verdict = F.when(F.col("__nb").isNull(), "blocked_domain")
        if url_decisions is not None:
            verdict = verdict.when(~F.col("__ukeep"), "url_duplicate")
        verdict = (
            verdict.when(F.col("__q").isNull(), "quality")
            .when(~F.col("__dkeep"), "duplicate")
            .otherwise("kept")
        )
        dup_of = F.when(verdict == "duplicate", F.col("__ddup"))
        if url_decisions is not None:
            dup_of = F.when(
                verdict == "url_duplicate", F.col("__udup")
            ).otherwise(dup_of)
        decisions = st.select("doc_id", verdict.alias("status"),
                              dup_of.alias("dup_of"))
        decisions_sink(decisions, batch_id)

        # --- guarded state appends ------------------------------------
        if not already:
            if new_url_keys is not None:
                new_url_keys.write.mode("append").parquet(url_keys_dir)
            if new_fp_keys is not None:
                new_fp_keys.write.mode("append").parquet(fp_keys_dir)
            if new_fp_cands is not None:
                new_fp_cands.write.mode("append").parquet(fp_cands_dir)
            if new_sig_cands is not None:
                new_sig_cands.write.mode("append").parquet(sig_cands_dir)
            if kept_sigs is not None:
                kept_sigs.write.mode("append").parquet(sig_dir)
            spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.mode("append").parquet(ledger_dir)
            if compact_every and (n_led + 1) % compact_every == 0:
                if dedup == "exact":
                    redecided = _compact_redecide(
                        spark, fp_keys_dir, fp_cands_dir, keeper_map_dir
                    )
                    dirs = [url_keys_dir, sig_dir] + (
                        [] if redecided else [fp_keys_dir]
                    )
                else:
                    redecided = _compact_redecide_near(
                        spark, sig_dir, sig_cands_dir, keeper_map_dir
                    )
                    dirs = [url_keys_dir, fp_keys_dir] + (
                        [] if redecided else [sig_dir]
                    )
                for d in dirs:
                    if _read_if_exists(spark, d) is not None:
                        _compact_store(spark, d)

    writer = docs_stream.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
