"""Near-duplicate detection at scale: MinHash+LSH, SimHash, and n-gram
Jaccard.

Scale shapes (the 100 TB story):

- **MinHash+LSH**: shingle → per-shingle ``xxhash64`` under k seeds →
  per-doc min (one narrow agg) → band signatures → *bucket join* (only
  docs sharing a band bucket are compared).  Candidate verification is a
  join on doc pairs, never an all-pairs product.
- **SimHash**: 64-bit signature from per-token hashes; near-dup = equal
  band keys on rotated signatures (Hamming-adjacent docs collide).
- **n-gram Jaccard**: exact set overlap via shingle equi-join +
  groupBy — quadratic only within shingle buckets, used as the
  verifier for LSH candidates or directly at small scale.

Everything is built-in functions + higher-order SQL over arrays; no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["shingles", "minhash_signatures", "minhash_lsh_candidates", "simhash", "ngram_jaccard_pairs"]


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: split → sliding window via
    transform over token indexes → explode."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # spread docs across all cores first: a single parquet file otherwise
    # pins the whole shingle/hash pipeline to one task
    spark = docs.sparkSession
    d = (
        docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= n)
    )
    # i ∈ [0, size-n] → size-n+1 shingles
    sh = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
    )
    return d.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: each shingle string is xxhash64'd ONCE,
    then the ``num_hashes`` family members re-hash that single 8-byte
    value with a per-function salt — fixed-width hashing instead of 64
    string re-hashes per shingle (and no long-arithmetic overflow, which
    ANSI mode would reject).  One groupBy(doc_id); linear in total
    shingle count."""
    sh = shingles(docs, n=n).select("doc_id", F.xxhash64("shingle").alias("h"))
    mins = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band signature become candidate
    pairs (a < b).  The band bucket join is the only pairwise step —
    complexity is bounded by bucket occupancy, not corpus size."""
    rows_per_band = num_hashes // bands
    # cache: the self-join would otherwise recompute the full signature
    # pipeline for each side
    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n).cache()
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash: per-token xxhash64; signature bit i is the sign of
    the sum over tokens of ±1 for that bit.  Pure higher-order-function
    aggregation — one pass, no shuffle beyond the final projection."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    # explode → one xxhash64 per token, then 64 codegen'd conditional sums
    # (map-side partial agg; stays in whole-stage codegen, unlike a
    # higher-order `aggregate` lambda which is interpreted per element)
    h = docs.select("doc_id", F.explode(toks).alias("t")).select(
        "doc_id", F.xxhash64("t").alias("h")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle:
    |A∩B| from the shingle self-join, |A|,|B| from per-doc counts;
    emits (doc_a < doc_b, jaccard ≥ threshold)."""
    sh = shingles(docs, n=n).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
