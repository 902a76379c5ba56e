"""Web-corpus curation on URL structure — the filter stage that runs
BEFORE content-level dedup in a crawl pipeline (RefinedWeb, C4, and
CCNet all gate on URL first: it's ~100 bytes per doc instead of the
full text, and it kills exact refetches and spam domains for free).

Everything here is JVM built-ins (``parse_url``, array higher-order
functions) in whole-stage codegen — no Python in the hot path, the
filters push down to one narrow projection per document, and the only
shuffles are the keep-one aggregation in :func:`dedup_url` and the
per-domain window in :func:`cap_per_domain`.

Composes directly with :mod:`matcha_spark.sources.warc`, whose
documents carry the crawl's ``WARC-Target-URI`` in ``url``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "url_normalize",
    "dedup_url",
    "domain_blocklist_filter",
    "cap_per_domain",
]

# query parameters that identify a CAMPAIGN, not a resource — the
# standard tracking families stripped by canonicalizers so the same
# page fetched from two referrers dedups to one URL.  Only params that
# are UNAMBIGUOUSLY tracking ids belong here: ``ref``/``ref_src`` were
# dropped from the default in r12 (advice) because ``ref`` is a
# resource-identifying param on many real sites (``?ref=<branch>`` on
# code hosts), so stripping it canonicalized genuinely distinct pages
# to one URL and dedup_url / stream_seen_filter silently dropped
# distinct content.  Callers whose corpus uses ``ref`` as a referrer
# tag can widen the list per corpus via ``strip_params``.
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "twclid", "mc_eid", "igshid")


def url_host(url: Column | str) -> Column:
    """Lower-cased hostname of a URL (NULL when unparseable)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def _clean_query(q: Column, strip_params, strip_prefixes) -> Column:
    """Sort query parameters and drop tracking ones: ``b=2&a=1&utm_x=3``
    → ``a=1&b=2``.  Split/filter/sort/join — all array built-ins."""
    parts = F.split(q, "&")
    name = lambda p: F.lower(F.split(p, "=").getItem(0))  # noqa: E731

    def keep(p):
        cond = p != ""
        if strip_params:
            cond = cond & ~name(p).isin(*strip_params)
        for pref in strip_prefixes:
            cond = cond & ~name(p).startswith(pref)
        return cond

    return F.array_join(F.array_sort(F.filter(parts, keep)), "&")


def url_normalize(
    url: Column | str,
    strip_params: tuple[str, ...] = _TRACKING_EXACT,
    strip_prefixes: tuple[str, ...] = _TRACKING_PREFIXES,
) -> Column:
    """Canonical form of a URL for url-level dedup:

    - scheme and host lower-cased; default ports (``:80`` http,
      ``:443`` https) stripped
    - fragment dropped (client-side only, never a distinct resource)
    - trailing ``/`` stripped from the path; bare ``/`` path dropped
    - query parameters SORTED and tracking parameters (``utm_*``,
      ``fbclid``, ``gclid``, ...) removed — the same page reached via
      two campaigns canonicalizes to one URL.  The strip lists are
      parameters: the default covers only unambiguous tracking ids
      (no ``ref`` — see the note on ``_TRACKING_EXACT``); tune
      ``strip_params`` / ``strip_prefixes`` per corpus.

    **Store-key migration caveat (r12 advice):** the r12 default
    change (``ref``/``ref_src`` no longer stripped) changed the
    canonical form of URLs that carry those params — any PERSISTED
    state keyed on ``url_normalize`` output built before the change
    (``stream_curate`` url seen-stores, ``stream_seen_filter`` key
    stores, ``dedup_url`` snapshots) will not match refetches that
    differ only in a previously-stripped param, so those records are
    re-admitted once.  Either rebuild such stores, or pass
    ``strip_params=(*_TRACKING_EXACT, "ref", "ref_src")`` to keep the
    old keying.

    URLs with no parseable host pass through unchanged (better to
    under-merge than to corrupt an opaque identifier).  Pure built-ins
    → whole-stage codegen; safe to run on every crawl record."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = url_host(c)
    authority = F.lower(F.try_parse_url(c, F.lit("AUTHORITY")))
    default_port = F.when(scheme == "http", F.lit(":80")).when(
        scheme == "https", F.lit(":443")
    )
    hostport = F.when(
        default_port.isNotNull()
        & (authority == F.concat(host, default_port)),
        host,
    ).otherwise(authority)
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    q = _clean_query(
        F.coalesce(F.try_parse_url(c, F.lit("QUERY")), F.lit("")),
        strip_params,
        strip_prefixes,
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(host.isNotNull() & scheme.isNotNull(), rebuilt).otherwise(c)


def dedup_url(
    docs: DataFrame,
    url_col: str = "url",
    strip_params: tuple[str, ...] = _TRACKING_EXACT,
    strip_prefixes: tuple[str, ...] = _TRACKING_PREFIXES,
) -> DataFrame:
    """URL-level exact dedup: one ``(url_norm, keep_doc_id, n_copies)``
    row per canonical URL, keeper = min doc_id — the same keep-one
    contract and single hash-groupBy shape as ``text.dedup_exact``, on
    ~100-byte keys instead of document fingerprints (run it first; a
    refetch never reaches the content-dedup shuffle)."""
    return (
        docs.select(
            "doc_id",
            url_normalize(url_col, strip_params, strip_prefixes).alias(
                "url_norm"
            ),
        )
        .groupBy("url_norm")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname: ``a.b.example.com`` →
    ``[a.b.example.com, b.example.com, example.com, com]`` — one
    ``transform`` over the label positions, no UDF."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def domain_blocklist_filter(
    docs: DataFrame,
    blocked: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose host falls under any blocked domain,
    SUFFIX-aware: blocking ``example.com`` also blocks
    ``sub.example.com`` (how real blocklists — adult/spam/SEO-farm
    registries — are written; an equality match would leak every
    subdomain).

    ``blocked``: a one-string-column DataFrame or a plain list of
    domains.  Shape: explode each doc's host into its ≤ ~6 dot-suffixes
    and LEFT ANTI join against the blocklist — the list is small by
    nature (10⁴–10⁶ rows ≪ corpus), so Spark broadcasts it and the
    filter is map-side; the explode multiplies rows by label count
    only inside the join stage, never materialized."""
    spark = docs.sparkSession
    if isinstance(blocked, list):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], "domain string"
        )
    bl = blocked.select(
        F.lower(F.trim(F.col(blocked.columns[0]))).alias("__blocked_dom")
    )
    hit = (
        docs.select(
            "doc_id",
            F.explode(
                _host_suffixes(F.coalesce(url_host(url_col), F.lit("")))
            ).alias("__sfx"),
        )
        .join(F.broadcast(bl), F.col("__sfx") == F.col("__blocked_dom"))
        .select("doc_id")
    )
    return docs.join(hit, "doc_id", "left_anti")


def cap_per_domain(
    docs: DataFrame, n: int, url_col: str = "url", salt: str = ""
) -> DataFrame:
    """At most ``n`` documents per registrable host — the anti-spam
    quota keyed on the URL instead of a pre-extracted source column
    (thin composition over ``text.cap_per_group``'s deterministic
    md5-order window; hostless docs form their own '' group)."""
    from .text import cap_per_group

    with_host = docs.withColumn(
        "__host", F.coalesce(url_host(url_col), F.lit(""))
    )
    return cap_per_group(with_host, n, group_col="__host", salt=salt).drop(
        "__host"
    )
