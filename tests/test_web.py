"""URL-structure curation operators (operators/web.py): normalization,
url-level dedup, suffix-aware blocklists, per-domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from matcha_spark.operators.web import (
    cap_per_domain,
    dedup_url,
    domain_blocklist_filter,
    url_host,
    url_normalize,
)


def _norm(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(url_normalize(F.lit(url)).alias("u"))
        .collect()[0]
        .u
    )


def test_url_normalize_cases(spark):
    cases = {
        # scheme/host case, default port, trailing slash
        "HTTP://WWW.Example.COM:80/Path/": "http://www.example.com/Path",
        "https://example.com:443/a": "https://example.com/a",
        # non-default port kept
        "http://example.com:8080/a": "http://example.com:8080/a",
        # fragment dropped
        "https://example.com/a#section-2": "https://example.com/a",
        # query sorted, tracking params stripped
        "https://example.com/a?b=2&utm_source=x&a=1&fbclid=zz":
            "https://example.com/a?a=1&b=2",
        # bare slash path dropped
        "https://example.com/": "https://example.com",
        # path CASE preserved (paths are case-sensitive per RFC)
        "https://example.com/CaseSensitive": "https://example.com/CaseSensitive",
        # no host: passes through untouched
        "not a url at all": "not a url at all",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw


def test_dedup_url_keep_one(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "https://example.com/a?utm_source=tw&x=1"),
            ("d2", "HTTPS://EXAMPLE.com:443/a/?x=1"),
            ("d3", "https://example.com/b"),
        ],
        "doc_id string, url string",
    )
    got = {r.url_norm: r for r in dedup_url(docs).collect()}
    assert got["https://example.com/a?x=1"].keep_doc_id == "d1"
    assert got["https://example.com/a?x=1"].n_copies == 2
    assert got["https://example.com/b"].n_copies == 1


def test_domain_blocklist_suffix_aware(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "https://spam.example.com/x"),     # subdomain of blocked
            ("d2", "https://example.com/y"),          # blocked exactly
            ("d3", "https://notexample.com/z"),       # NOT a suffix match
            ("d4", "https://good.org/w"),
            ("d5", "no-url-here"),                    # hostless: kept
        ],
        "doc_id string, url string",
    )
    kept = {
        r.doc_id
        for r in domain_blocklist_filter(docs, ["example.com"]).collect()
    }
    assert kept == {"d3", "d4", "d5"}

    # blocklist as a DataFrame, mixed case + whitespace tolerated
    bl = spark.createDataFrame([(" Example.COM ",)], "domain string")
    kept2 = {
        r.doc_id for r in domain_blocklist_filter(docs, bl).collect()
    }
    assert kept2 == kept


def test_cap_per_domain(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"https://big.com/{i}") for i in range(10)]
        + [("s1", "https://small.com/1"), ("s2", "https://small.com/2")],
        "doc_id string, url string",
    )
    capped = cap_per_domain(docs, 3)
    per = {
        r.host: r.n
        for r in capped.select(url_host("url").alias("host"))
        .groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"big.com": 3, "small.com": 2}
    # deterministic + nested: the 3-cap keep set is inside the 5-cap one
    k3 = {r.doc_id for r in capped.collect()}
    k5 = {r.doc_id for r in cap_per_domain(docs, 5).collect()}
    assert k3 < k5
    assert capped.columns == docs.columns


def test_url_normalize_idempotent(spark):
    """A canonicalizer must be a projection: normalizing twice equals
    normalizing once, over a generated zoo of URL shapes (one Spark
    job for the whole batch — hypothesis drives the generation, Spark
    evaluates in bulk)."""
    import random

    rng = random.Random(11)
    schemes = ["http", "https", "HTTP", "ftp"]
    hosts = ["Example.COM", "a.b.c.org", "x", "127.0.0.1", "?", ""]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/a//", "/a/b/c/", "/%20x"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&z=9", "?a", "?=v", "?a=1&a=0"]
    frags = ["", "#f", "#a b"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(200)
    ] + ["not a url", "mailto:x@y.z", "//missing-scheme", ""]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = url_normalize("u").alias("n1")
    rows = df.select("u", once).select(
        "u", "n1", url_normalize(F.col("n1")).alias("n2")
    ).collect()
    bad = [(r.u, r.n1, r.n2) for r in rows if r.n1 != r.n2]
    assert not bad, bad[:5]


def test_url_normalize_permutation_and_tracking_invariant(spark):
    """The dedup-key property behind url_dedup: the SAME resource
    reached with its query parameters in any order, with any mix of
    tracking params injected at any position, canonicalizes to ONE
    key.  Generated: random shuffles of a fixed param set x random
    utm/fbclid/gclid injections — every variant must normalize to the
    canonical sorted, tracking-free form."""
    import random

    rng = random.Random(23)
    base = "https://Example.com/Path"
    params = ["a=1", "b=2", "c=", "z=9"]
    tracking = ["utm_source=x", "utm_campaign=Y", "fbclid=abc", "gclid=1"]
    want = None
    variants = []
    for _ in range(40):
        ps = params[:]
        for t in rng.sample(tracking, rng.randint(0, len(tracking))):
            ps.insert(rng.randint(0, len(ps)), t)
        rng.shuffle(ps)
        variants.append(base + "?" + "&".join(ps))
    df = spark.createDataFrame([(u,) for u in variants], "u string")
    got = {r.n for r in df.select(url_normalize("u").alias("n")).collect()}
    assert got == {"https://example.com/Path?a=1&b=2&c=&z=9"}, got


def test_warc_to_web_curation(spark, tmp_path):
    """Crawl-pipeline head end-to-end: WARC segment → documents →
    url dedup + blocklist, on the url the WARC record carried."""
    from tests.test_sources_warc import _http, _record, _write
    from matcha_spark.sources.warc import read_warc_documents

    recs = b"".join(
        [
            _record("response", _http(b"page a"),
                    uri="https://keep.org/a", rec_id="<urn:uuid:a>"),
            _record("response", _http(b"page a refetch"),
                    uri="https://keep.org/a?utm_source=x",
                    rec_id="<urn:uuid:a2>"),
            _record("response", _http(b"spam"),
                    uri="https://ads.spam.net/buy", rec_id="<urn:uuid:s>"),
        ]
    )
    path = _write(tmp_path, "crawl.warc", recs)
    docs = read_warc_documents(spark, path)
    clean = domain_blocklist_filter(docs, ["spam.net"])
    assert {r.doc_id for r in clean.collect()} == {"urn:uuid:a", "urn:uuid:a2"}
    urls = dedup_url(clean).collect()
    assert len(urls) == 1 and urls[0].n_copies == 2
    assert urls[0].keep_doc_id == "urn:uuid:a"


def test_ref_param_is_resource_identifying(spark):
    """r12 advice: ``ref`` identifies a resource on many real sites
    (``?ref=<branch>`` on code hosts) — the default canonicalizer must
    NOT merge distinct refs, while unambiguous tracking ids still
    strip; per-corpus widening goes through ``strip_params``."""
    a = _norm(spark, "https://example.com/repo/tree?ref=main")
    b = _norm(spark, "https://example.com/repo/tree?ref=dev")
    assert a != b and "ref=main" in a and "ref=dev" in b
    # tracking ids still strip alongside it
    assert (
        _norm(spark, "https://example.com/repo/tree?ref=main&gclid=x")
        == a
    )
    # opt-in widening for corpora where ref IS a referrer tag
    got = (
        spark.range(1)
        .select(
            url_normalize(
                F.lit("https://example.com/a?ref=twitter&x=1"),
                strip_params=("ref",),
            ).alias("u")
        )
        .collect()[0]
        .u
    )
    assert got == "https://example.com/a?x=1"
