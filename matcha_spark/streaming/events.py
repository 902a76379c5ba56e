"""Structured Streaming operators over an events stream
(``event_id, ts, user_id, event_type, value, props``).

Streaming twins of the batch operators in ``matcha_spark.relational``:
the same logical plans run on ``readStream`` sources with watermarks
for late data.  At cluster scale these run against Kafka/files; tests
drive them with in-memory batches via the file source + memory sink.

- :func:`hourly_counts` — tumbling-window count/sum with watermark.
- :func:`sliding_activity` — sliding window per event_type.
- :func:`sessionize_stateful` — gap-based sessions via
  ``applyInPandasWithState`` (custom stateful operator: the Spark-native
  replacement for an imperative per-key session tracker).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "hourly_counts",
    "sliding_activity",
    "sessionize_native",
    "sessionize_stateful",
    "stream_dedup",
    "stream_enrich",
    "stream_interval_join",
    "stream_transitions",
    "SESSION_SCHEMA",
    "TRANSITION_SCHEMA",
]


def hourly_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows; watermark bounds state for late rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_activity(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """15-minute sliding windows advancing every 5 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes", "5 minutes").alias("win"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("win.start").alias("window_start"), "approx_users", "n")
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream equi-join with a time-interval condition: each left
    event pairs with right events for the same key within ``within``
    *before* it.  Watermarks on both sides bound the join state — Spark
    evicts buffered rows once the watermark passes the interval, so
    state is O(key-rate × window), never unbounded."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def sessionize_native(
    events: DataFrame, gap_s: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Gap sessionization with Spark's built-in ``session_window``: the
    engine merges/extends session state incrementally and closes a
    session once the watermark passes its end — no custom state code.
    Identical aggregation to the batch ``relational.
    events_sessionize_native``, which is the point: one plan, two
    execution modes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{gap_s} seconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(last_us, unit="us")],
                        "n_events": [n],
                        "session_value": [total],
                    }
                )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        closed = []
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0
        for ts, value in zip(rows["ts"], rows["value"]):
            us = ts.value // 1000
            if last_us is not None and us - last_us > gap_us:
                closed.append((start_us, last_us, n, total))
                start_us, n, total = us, 0, 0.0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            total += float(value)
        state.update((start_us, last_us, n, total))
        state.setTimeoutDuration(gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: per-user session accumulation
    with processing-time timeout flush.  Emits a session row when a gap
    larger than ``gap_s`` closes it (or on state timeout).

    Arrow-batched per-key state (``applyInPandasWithState``) — the
    idiomatic Spark shape for operators that the built-in windowed aggs
    can't express."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_dedup(events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drops duplicate events within the
    watermark horizon (bounded state — the streaming twin of
    ``operators.text.dedup_exact``)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    on,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a streaming event frame against a
    static dimension table — the most common streaming pattern (attach
    customer/device/experiment attributes to each event).

    Spark plans stream-static joins without any streaming state: the
    static side is re-read (and, under AQE, broadcast when it fits) per
    micro-batch, so there is no watermark requirement and no state-store
    growth.  At 100 TB-class dimension sizes, pre-broadcast or bucket
    the dim and keep only ``dim_cols``.  Inner and left joins are the
    streaming-supported shapes for a stream-left join; right/full would
    need the unmatched-dim side re-emitted per batch and raise in Spark
    itself."""
    if dim_cols is not None:
        keys = [on] if isinstance(on, str) else list(on)
        dim = dim.select(*keys, *[c for c in dim_cols if c not in keys])
    return events.join(dim, on=on, how=how)


TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# per-user carry-over: timestamp (µs) and type of the last event seen
_TRANS_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transitions_fn():
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            last_us, last_type = state.get
        else:
            last_us, last_type = None, None
        out_from, out_to, out_ts = [], [], []
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if last_type is not None:
                out_from.append(last_type)
                out_to.append(etype)
                out_ts.append(ts)
            last_us, last_type = ts.value // 1000, etype
        state.update((last_us, last_type))
        if out_from:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_from),
                    "from_type": out_from,
                    "to_type": out_to,
                    "ts": out_ts,
                }
            )

    return fn


def stream_transitions(events: DataFrame) -> DataFrame:
    """Streaming per-user event-type transitions — the incremental twin
    of ``relational.events_transition_matrix``: each arriving event
    emits one ``(from_type, to_type)`` edge against the user's previous
    event, carried in per-key state (one 2-field row per active user —
    constant-size state, no watermark horizon needed).

    Ordering contract: transitions are exact when each user's events
    arrive in timestamp order across micro-batches (within a batch they
    are sorted); cross-batch out-of-order arrivals chain in arrival
    order, the best any single-pass incremental operator can do without
    buffering a reorder horizon.  Downstream, aggregate with
    ``groupBy("from_type", "to_type").count()`` for the live matrix."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions_fn(),
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_TRANS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
