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
    **extra_confs: str,
) -> SparkSession:
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
    for k, v in extra_confs.items():
        b = b.config(k.replace("__", "."), v)
    return b.getOrCreate()
