"""Streaming seen-KEY admission — the exact-match sibling of the
signature-based :mod:`matcha_spark.streaming.dedup`.

A crawl or ingest stream wants two cheap exact filters long before any
near-dup signature work: "have we fetched this canonical URL?" and
"have we admitted this exact content fingerprint?".  Both are the same
operator — a persisted ``(key, keeper)`` store, one equi-join per
micro-batch — differing only in the key expression
(``operators.web.url_normalize`` vs an ``md5`` of normalized text).

The store/replay machinery is shared with the signature path: a
``_batches`` ledger makes the append idempotent under micro-batch
replay, the explicit FS-existence probe distinguishes "no store yet"
from a genuine read error, and periodic compaction bounds the
small-file count with the same crash-safe two-rename swap.

Scale: the store holds one ~100-byte row per distinct key ever
admitted, and the per-batch probe is a key-partitioned equi-join —
batch × store, shuffled on the key.  At crawl scale the store is the
big side; write it bucketed by key (``bucketBy`` on the same column)
to make the probe a shuffle-free bucket join, exactly the standard
seen-URL-table layout.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _compact_store,
    _ledger_probe,
    _read_if_exists,
    _recover_store,
)

__all__ = ["stream_seen_filter"]


def stream_seen_filter(
    stream: DataFrame,
    store_path: str,
    decisions_sink: Callable[[DataFrame, int], None],
    key: Column | str,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    compact_every: int = 64,
):
    """Admit stream rows whose KEY has never been seen before.

    ``key``: a Column expression (e.g. ``url_normalize("url")`` or
    ``F.md5(F.col("text"))``) or a column name, evaluated against each
    micro-batch.  ``decisions_sink`` receives one ``(id_col, keep,
    dup_of)`` row per input row and the batch id — the same verdict
    contract as the near-dup family: ``keep`` is true for the first
    row ever carrying the key (store wins over batch; within a batch
    the min id wins), ``dup_of`` names the keeper on rejections and is
    NULL on keeps.  Rows whose key evaluates to NULL are always kept
    and never stored (an unmatchable key matches nothing).

    Returns the started ``StreamingQuery``.  Replay-safe and
    crash-safe exactly as :func:`streaming.dedup.stream_incremental_dedup`
    (shared ledger/recovery/compaction machinery)."""
    key_expr = F.col(key) if isinstance(key, str) else key
    keys_dir = os.path.join(store_path, "keys")
    ledger_dir = os.path.join(store_path, "_batches")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover_store(spark, keys_dir)
        store = _read_if_exists(spark, keys_dir)
        ledger = _read_if_exists(spark, ledger_dir)
        already, n_led = _ledger_probe(
            ledger, batch_id, with_count=bool(compact_every)
        )
        b = batch_df.select(
            F.col(id_col).alias("__id"), key_expr.alias("__key")
        )
        if store is None:
            store = (
                b.select(
                    F.col("__key").alias("key"), F.col("__id").alias("keeper")
                ).limit(0)
            )
        batch_keep = (
            b.where(F.col("__key").isNotNull())
            .groupBy("__key")
            .agg(F.min("__id").alias("__batch_keeper"))
        )
        joined = (
            b.join(store, b["__key"] == store["key"], "left")
            .join(batch_keep, "__key", "left")
        )
        # the (keeper == id) clause makes REPLAYED decisions identical
        # to the original run: after a crash the store already holds
        # this batch's keys with this batch's keepers, and the original
        # keeper must still read as kept — exact idempotence the
        # signature path can only approximate
        keep = F.coalesce(
            F.col("__key").isNull()
            | (F.col("keeper").isNull()
               & (F.col("__id") == F.col("__batch_keeper")))
            # NULL-safe: a NULL keeper makes the equality NULL, which
            # must read as "not the stored keeper", never poison the OR
            | (F.col("keeper") == F.col("__id")),
            F.lit(False),
        )
        decisions = joined.select(
            F.col("__id").alias(id_col),
            keep.alias("keep"),
            F.when(keep, F.lit(None)).otherwise(
                F.coalesce(F.col("keeper"), F.col("__batch_keeper"))
            ).alias("dup_of"),
        )
        decisions_sink(decisions, batch_id)
        if not already:
            new_keys = (
                joined.where(
                    F.col("__key").isNotNull() & F.col("keeper").isNull()
                )
                .select(
                    F.col("__key").alias("key"),
                    F.col("__batch_keeper").alias("keeper"),
                )
                .distinct()
            )
            new_keys.write.mode("append").parquet(keys_dir)
            spark.createDataFrame(
                [(int(batch_id),)], "batch_id long"
            ).write.mode("append").parquet(ledger_dir)
            if compact_every and (n_led + 1) % compact_every == 0:
                _compact_store(spark, keys_dir)

    writer = stream.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
