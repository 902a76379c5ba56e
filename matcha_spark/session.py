"""Session helper with the engine's recommended configuration
(docs/TUNING.md has the cluster-scale rationale for each knob)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "matcha-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    rocksdb_state_store: bool = False,
    **extra_confs: str,
) -> SparkSession:
    """Build/get the engine's SparkSession.

    ``rocksdb_state_store=True`` switches Structured Streaming state to
    the RocksDB provider (off-heap, spillable, changelog-checkpointed) —
    the production choice once stateful-operator state (e.g.
    ``sessionize_stateful``'s per-user rows, stream-stream join buffers)
    outgrows the default in-memory HDFS-backed provider; see
    docs/TUNING.md §Streaming.  Note ``getOrCreate`` semantics: configs
    only apply when this call *creates* the session.
    """
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # subject-bucketed stores: the BGP self-join keys are
        # (s_key, s-struct); the bucketed scan's partitioning covers only
        # s_key, so subset co-partitioning must be allowed for the
        # bucket join to elide its exchanges (semantics-preserving — a
        # subset hash partitioning still co-locates equal full keys)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if rocksdb_state_store:
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            # checkpoint RocksDB changelogs instead of full snapshots:
            # commit cost stays proportional to the *delta*, not the
            # total state size — essential at production state sizes
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    for k, v in extra_confs.items():
        b = b.config(k.replace("__", "."), v)
    return b.getOrCreate()
