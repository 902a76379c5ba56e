"""Streaming near-deduplication: the batch incremental-dedup operators
(:mod:`matcha_spark.operators.dedup`) lifted onto Structured Streaming.

The store-recipe operators (``incremental_dedup_near`` /
``incremental_dedup_simhash``) are ALREADY the streaming shape — each
call admits one batch against an append-only signature store — so the
streaming integration is ``foreachBatch``: every micro-batch loads the
persisted store, runs the batch admission, appends the kept documents'
signatures back, and emits the per-document verdicts to the caller's
sink.  Spark's own micro-batch sequencing serializes store updates
(one ``foreachBatch`` invocation at a time per query), and the
batch-id guard makes the store update idempotent under micro-batch
REPLAY after a failure — the exactly-once contract ``foreachBatch``
itself does not give you.

At cluster scale the store lives on shared storage next to the
checkpoint dir; its size is ~16 bytes/doc (SimHash) or ~512 bytes/doc
(MinHash) — state the executors never hold in memory between batches.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_incremental_dedup"]


def stream_incremental_dedup(
    docs_stream: DataFrame,
    store_path: str,
    decisions_sink: Callable[[DataFrame, int], None],
    method: str = "simhash",
    checkpoint_dir: str | None = None,
    **dedup_kwargs,
):
    """Run streaming near-dedup over a document stream.

    ``docs_stream``: a streaming DataFrame with ``(doc_id, text)`` (any
    extra columns pass through to ``decisions_sink`` untouched via the
    decisions join).  ``store_path``: parquet directory for the
    signature store (shared storage on a cluster).  ``decisions_sink``:
    called once per micro-batch with the decisions DataFrame
    ``(doc_id, keep, dup_of)`` and the batch id — write to your sink
    there.  ``method``: ``"simhash"`` (16 B/doc store) or ``"minhash"``
    (~512 B/doc, estimator-based).  Extra kwargs flow to the batch
    operator (``max_hamming=``, ``threshold=``, ...).

    Returns the started ``StreamingQuery``.

    Replay safety: the store append is guarded by a ``_batches``
    ledger under ``store_path`` — a replayed micro-batch (same epoch
    id) recomputes decisions (deterministic: signatures are pure
    functions of the text) but does NOT append its signatures twice.
    """
    from ..operators.dedup import incremental_dedup_near, incremental_dedup_simhash

    if method not in ("simhash", "minhash"):
        raise ValueError(f"method must be simhash|minhash, got {method!r}")

    sig_dir = os.path.join(store_path, "sigs")
    ledger_dir = os.path.join(store_path, "_batches")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(sig_dir)
        except Exception:
            existing = None
        try:
            done = {
                r.batch_id
                for r in spark.read.parquet(ledger_dir).collect()
            }
        except Exception:
            done = set()
        if method == "simhash":
            decisions, _ = incremental_dedup_simhash(
                batch_df, existing, **dedup_kwargs
            )
        else:
            decisions, _ = incremental_dedup_near(
                batch_df, existing, **dedup_kwargs
            )
        # the updated store returned by the operator is existing ∪ kept;
        # append ONLY the kept-batch delta so the parquet dir stays
        # append-only (replay-guarded below)
        if method == "simhash":
            from ..operators.dedup import simhash

            sig_new = simhash(batch_df)
            kept = sig_new.join(
                decisions.where(F.col("keep")).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        else:
            from ..operators.dedup import minhash_signatures

            nh = dedup_kwargs.get("num_hashes", 64)
            sig_new = minhash_signatures(
                batch_df, num_hashes=nh, n=dedup_kwargs.get("n", 3)
            ).select("doc_id", *[f"h{i}" for i in range(nh)])
            kept = sig_new.join(
                decisions.where(F.col("keep")).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        decisions_sink(decisions, batch_id)
        if batch_id not in done:
            kept.write.mode("append").parquet(sig_dir)
            spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.mode("append").parquet(ledger_dir)

    writer = docs_stream.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
