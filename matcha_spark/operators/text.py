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
    "boilerplate_lines",
    "strip_boilerplate",
    "quality_filter",
    "scrub_pii",
    "corpus_stats",
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


def boilerplate_lines(
    docs: DataFrame, min_doc_freq: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-level boilerplate detection (the C4/RefinedWeb cleaning
    step): lines whose *normalized* form appears in ≥ ``min_doc_freq``
    distinct documents (cookie banners, nav menus, license footers).

    One explode + one groupBy on the normalized line — the same
    hash-aggregate shape as exact dedup; never pairwise."""
    norm_line = F.lower(F.trim(F.col("line")))
    return (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .select("doc_id", norm_line.alias("norm"))
        .where(F.col("norm") != "")
        .distinct()
        .groupBy("norm")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_doc_freq)
    )


def strip_boilerplate(
    docs: DataFrame, min_doc_freq: int = 3, text_col: str = "text"
) -> DataFrame:
    """Remove corpus-frequent lines from every document, preserving the
    order of surviving lines.

    Plan shape: explode lines with their position → anti-join against
    the (small) boilerplate set on the normalized line → regroup by doc
    with ``sort_array(collect_list(struct(pos, line)))`` — one explode,
    one anti-join, one shuffle on doc_id.  Docs reduced to nothing keep
    an empty string."""
    bp = boilerplate_lines(docs, min_doc_freq=min_doc_freq, text_col=text_col).select("norm")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))
    kept = lines.join(bp, on="norm", how="left_anti")
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    # docs whose every line was boilerplate drop out of the groupBy;
    # restore them with empty text
    return (
        docs.select("doc_id")
        .join(rebuilt, on="doc_id", how="left")
        .select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    max_avg_token_len: float = 12.0,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Composite quality gate (Gopher/C4-style rules) over the
    :func:`text_quality` signals; returns the surviving ``doc_id`` rows
    with their signals so downstream stages can audit the cut."""
    q = text_quality(docs, text_col=text_col)
    return q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("avg_token_len") <= max_avg_token_len)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )


# deliberately simple, auditable patterns: emails, international-ish
# phone numbers, IPv4 — the structure (ordered JVM regexp passes) is the
# point; production pattern sets drop in per deployment
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace common PII shapes with typed placeholder tags — ordered
    ``regexp_replace`` passes, all JVM-side (no Python in the path)."""
    col = F.col(text_col)
    for pat, tag in _PII_PATTERNS:
        col = F.regexp_replace(col, pat, tag)
    return docs.select("doc_id", col.alias(text_col))


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary (docs, tokens, chars, vocab-ish distinct
    fingerprints) — the numbers a pipeline run reports; single pass +
    tiny aggregate."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(text_col))).alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).alias("n_chars"),
        F.countDistinct(F.md5(norm)).alias("n_unique_docs"),
    )
