"""Text-analysis operators for LLM-data pipelines over a ``documents``
table (``doc_id``, ``text``, …).

All hot-path expressions are built-in ``pyspark.sql.functions`` /
higher-order SQL functions — JVM-side, whole-stage-codegen'd, no Python
UDFs — so they scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "text_quality",
    "lang_id",
    "fingerprint",
    "dedup_exact",
]

# tiny in-query stopword lists for the heuristic scorers
_EN_STOP = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]
_ES_STOP = ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"]
_FR_STOP = ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"]


def _tokens(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def _count_in(tokens_col, words: list[str]):
    lst = ",".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_col}, x -> lower(x) IN ({lst})))")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (≈ ceil(chars/4), the common rule of thumb)."""
    return docs.select(
        "doc_id",
        F.size(_tokens(text_col)).alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("est_bpe_tokens"),
    )


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase quality signals.

    Ratios are exact rational divisions of integer counts → bit-stable
    across engines (safe to oracle-compare after rounding)."""
    d = docs.withColumn("__toks", _tokens(text_col))
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(F.col("__toks"))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    n_stop = _count_in("__toks", _EN_STOP)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(n_chars / n_toks, 4).alias("avg_token_len"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round(n_upper / n_chars, 4).alias("upper_ratio"),
        F.round(n_stop / n_toks, 4).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID heuristic (en/es/fr, 'und' when no
    hits).  Deterministic integer votes with a fixed tie-break order."""
    d = docs.withColumn("__toks", _tokens(text_col))
    en, es, fr = (
        _count_in("__toks", _EN_STOP),
        _count_in("__toks", _ES_STOP),
        _count_in("__toks", _FR_STOP),
    )
    d = d.withColumn("__en", en).withColumn("__es", es).withColumn("__fr", fr)
    best = F.greatest("__en", "__es", "__fr")
    label = (
        F.when(best == 0, "und")
        .when(F.col("__en") == best, "en")  # tie-break: en > es > fr
        .when(F.col("__es") == best, "es")
        .otherwise("fr")
    )
    return d.select("doc_id", label.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (portable across engines —
    the rolling-hash variant lives in ``dedup.simhash``)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy on the normalized fingerprint:
    keeps the smallest doc_id per group.  One shuffle on the 128-bit
    fingerprint — the canonical 100 TB exact-dedup plan (never compares
    full texts pairwise)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
