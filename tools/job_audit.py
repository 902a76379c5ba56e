"""Jobs-per-admission audit for the incremental dedup family (r10).

The r09 verdict flagged ``dedup_incremental_simhash`` (12.7 s warm at
sf0.1) as job-count-bound, not data-bound: each admission chains an
eager memo count, a banded self-join, iterative connected-components
rounds (one job each), and the decisions/kept-sig consumers — and at
cluster scale those serialized jobs become scheduler round-trips per
micro-batch, capping streaming throughput.  This tool counts actual
Spark jobs per admission via job groups (`statusTracker`) and times
each phase, so the optimization work targets the measured floor
instead of a guess.

Usage: python tools/job_audit.py  [prints one JSON line]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("job-audit")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from matcha_spark.cache import clear_memo
    from matcha_spark.operators import dedup as D
    from matcha_spark.sources.tpch_graph import load_tables

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def count_jobs(tag, fn):
        sc.setJobGroup(tag, tag)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobGroup("", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        return out, jobs, round(dt, 3)

    spark.range(1_000_000).count()
    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    first = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)

    report = {}

    # cold pass: both admissions end-to-end (suite-entry shape)
    clear_memo()
    _, jobs, dt = count_jobs("cold_full", lambda: _entry(D, first, batch, force))
    report["cold_full"] = {"jobs": jobs, "sec": dt}

    # warm pass (memo hits from the cold pass)
    _, jobs, dt = count_jobs("warm_full", lambda: _entry(D, first, batch, force))
    report["warm_full"] = {"jobs": jobs, "sec": dt}

    # phase breakdown of ONE admission, warm store
    clear_memo()
    _, sigs = D.incremental_dedup_simhash(first, None, max_hamming=8)
    from matcha_spark.cache import memo_persist

    sigs = memo_persist(sigs)

    _, jobs, dt = count_jobs(
        "admission", lambda: force(D.incremental_dedup_simhash(batch, sigs, max_hamming=8)[0])
    )
    report["one_admission"] = {"jobs": jobs, "sec": dt}

    # r11: the embedding store path — one admission against a warm
    # vector store (the per-micro-batch floor of the semdedup method)
    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
    efirst = emb.where(F.col("vec_id") < 250)
    ebatch = emb.where(F.col("vec_id") >= 250)
    clear_memo()
    _, estore = D.incremental_semdedup(efirst, None, threshold=0.95, n_clusters=8)
    estore = memo_persist(estore)
    _, jobs, dt = count_jobs(
        "semdedup_admission",
        lambda: force(
            D.incremental_semdedup(ebatch, estore, threshold=0.95, n_clusters=8)[0]
        ),
    )
    report["semdedup_admission"] = {"jobs": jobs, "sec": dt}

    # r12 (verdict ask #5): pagerank joined the Observation diet — the
    # per-round dangling-mass scalar rides the ranks materialization
    # instead of its own anti-join collect job, so jobs should be
    # ~iters + setup, not ~2*iters + setup
    from matcha_spark.operators.graph import pagerank

    orders = load_tables(spark, SF_DIR, "orders")["orders"]
    edges = orders.select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
    )
    iters = 6
    clear_memo()
    _, jobs, dt = count_jobs(
        "pagerank", lambda: force(pagerank(edges, iters=iters))
    )
    report["pagerank_6it"] = {"jobs": jobs, "sec": dt, "iters": iters}

    print(json.dumps(report))
    spark.stop()


def _entry(D, first, batch, force):
    _, sigs = D.incremental_dedup_simhash(first, None, max_hamming=8)
    decisions, _ = D.incremental_dedup_simhash(batch, sigs, max_hamming=8)
    force(decisions)


if __name__ == "__main__":
    main()
