"""WARC ingestion source (sources/warc.py): synthetic ISO 28500
archives — plain and per-record-gzipped — through read_warc_documents
and the warc_malformed audit view."""

from __future__ import annotations

import gzip
import os
import zlib

import pytest

from matcha_spark.sources.warc import (
    _dechunk,
    _gunzip_members,
    read_warc_documents,
    warc_malformed,
)


def _record(
    rtype: str,
    block: bytes,
    uri: str = "http://example.com/",
    rec_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000001>",
    content_type: str = "application/http; msgtype=response",
    content_length: int | None = None,
) -> bytes:
    n = len(block) if content_length is None else content_length
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {n}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html; charset=utf-8",
          extra: str = "") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n{extra}\r\n"
    ).encode() + body


def _archive() -> bytes:
    recs = [
        _record("warcinfo", b"software: test\r\n",
                content_type="application/warc-fields"),
        _record("request", b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
                content_type="application/http; msgtype=request"),
        _record(
            "response",
            _http("<html>café utf8</html>".encode("utf-8")),
            uri="http://example.com/a",
            rec_id="<urn:uuid:aaaa>",
        ),
        _record(
            "response",
            _http("<html>café latin</html>".encode("latin-1"),
                  ctype="text/html; charset=ISO-8859-1"),
            uri="http://example.com/b",
            rec_id="<urn:uuid:bbbb>",
        ),
        # chunked transfer: 2 chunks then terminator
        _record(
            "response",
            (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Transfer-Encoding: chunked\r\n\r\n"
             b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"),
            uri="http://example.com/c",
            rec_id="<urn:uuid:cccc>",
        ),
        # gzip content-encoding
        _record(
            "response",
            (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Content-Encoding: gzip\r\n\r\n"
             + gzip.compress(b"inflate me")),
            uri="http://example.com/d",
            rec_id="<urn:uuid:dddd>",
        ),
        _record("resource", b"raw resource bytes",
                uri="http://example.com/r",
                rec_id="<urn:uuid:rrrr>",
                content_type="text/plain"),
    ]
    return b"".join(recs)


def _write(tmp_path, name: str, data: bytes) -> str:
    d = tmp_path / "warcs"
    os.makedirs(d, exist_ok=True)
    (d / name).write_bytes(data)
    return str(d)


def test_read_warc_responses(spark, tmp_path):
    path = _write(tmp_path, "seg-00001.warc", _archive())
    docs = {r.doc_id: r for r in read_warc_documents(spark, path).collect()}
    # responses only: warcinfo/request/resource excluded by default
    assert set(docs) == {"urn:uuid:aaaa", "urn:uuid:bbbb",
                         "urn:uuid:cccc", "urn:uuid:dddd"}
    a = docs["urn:uuid:aaaa"]
    assert a.text == "<html>café utf8</html>"
    assert a.url == "http://example.com/a"
    assert a.content_type == "text/html"
    assert a.source == "seg-00001.warc"
    assert a.date == "2026-08-15T00:00:00Z"
    # declared charset honored, not assumed utf-8
    assert docs["urn:uuid:bbbb"].text == "<html>café latin</html>"
    # chunked frames removed
    assert docs["urn:uuid:cccc"].text == "hello world"
    # content-encoding inflated
    assert docs["urn:uuid:dddd"].text == "inflate me"


def test_read_warc_record_types(spark, tmp_path):
    path = _write(tmp_path, "seg.warc", _archive())
    docs = {
        r.doc_id: r
        for r in read_warc_documents(
            spark, path, record_types=("resource",)
        ).collect()
    }
    assert set(docs) == {"urn:uuid:rrrr"}
    # resource blocks are content directly — no HTTP envelope to strip
    assert docs["urn:uuid:rrrr"].text == "raw resource bytes"
    assert docs["urn:uuid:rrrr"].content_type == "text/plain"


def test_read_warc_gz_multimember(spark, tmp_path):
    """Per-record gzip members (the Common Crawl layout) and one-shot
    whole-file gzip both decode to the same documents."""
    plain = _archive()
    members = b"".join(
        gzip.compress(_record(
            "response",
            _http(f"doc {i}".encode()),
            uri=f"http://example.com/{i}",
            rec_id=f"<urn:uuid:m{i}>",
        ))
        for i in range(3)
    )
    path1 = _write(tmp_path, "multi.warc.gz", members)
    got = {r.doc_id: r.text
           for r in read_warc_documents(spark, path1).collect()}
    assert got == {f"urn:uuid:m{i}": f"doc {i}" for i in range(3)}

    path2 = _write(tmp_path / "w2", "whole.warc.gz", gzip.compress(plain))
    assert read_warc_documents(spark, path2).count() == 4


def test_warc_malformed_resync(spark, tmp_path):
    """A corrupt record is quarantined and the parser resynchronizes on
    the next version line — later records still land."""
    good = _record("response", _http(b"after the bad one"),
                   uri="http://example.com/ok", rec_id="<urn:uuid:ok>")
    bad_len = _record("response", _http(b"x"), content_length=-1,
                      rec_id="<urn:uuid:bad>").replace(
        b"Content-Length: -1", b"Content-Length: nope")
    junk = b"this is not a warc record\r\n"
    path = _write(tmp_path, "mix.warc", junk + bad_len + good)
    docs = read_warc_documents(spark, path).collect()
    assert [d.doc_id for d in docs] == ["urn:uuid:ok"]
    reasons = sorted(r.reason for r in warc_malformed(spark, path).collect())
    assert reasons == ["bad_content_length", "not_a_record"]


def test_warc_truncated_block(spark, tmp_path):
    rec = _record("response", _http(b"present"), rec_id="<urn:uuid:p>")
    cut = rec + _record("response", _http(b"gone"), rec_id="<urn:uuid:g>")[:-30]
    path = _write(tmp_path, "trunc.warc", cut)
    assert [d.doc_id for d in read_warc_documents(spark, path).collect()] \
        == ["urn:uuid:p"]
    bad = warc_malformed(spark, path).collect()
    assert [b.reason for b in bad] == ["truncated_block"]


def test_warc_gz_truncated_tail(spark, tmp_path):
    """A truncated final gzip member: complete members decode, the tail
    is reported, the job never fails."""
    m1 = gzip.compress(_record("response", _http(b"kept"),
                               rec_id="<urn:uuid:k>"))
    m2 = gzip.compress(_record("response", _http(b"lost"),
                               rec_id="<urn:uuid:l>"))
    path = _write(tmp_path, "tail.warc.gz", m1 + m2[: len(m2) // 2])
    assert [d.doc_id for d in read_warc_documents(spark, path).collect()] \
        == ["urn:uuid:k"]
    reasons = [b.reason for b in warc_malformed(spark, path).collect()]
    assert reasons == ["gzip_truncated"]


def test_warc_feeds_dedup(spark, tmp_path):
    """The composition that matters: WARC segments → documents →
    exact dedup, WARC-Record-IDs as the unique doc ids."""
    from matcha_spark.operators.text import dedup_exact

    recs = b"".join(
        _record("response", _http(b"identical page body"),
                uri=f"http://example.com/{i}",
                rec_id=f"<urn:uuid:x{i}>")
        for i in range(3)
    ) + _record("response", _http(b"unique page body"),
                uri="http://example.com/u", rec_id="<urn:uuid:u>")
    path = _write(tmp_path, "dup.warc", recs)
    docs = read_warc_documents(spark, path)
    kept = {r.keep_doc_id: r.n_copies for r in dedup_exact(docs).collect()}
    assert kept == {"urn:uuid:u": 1, "urn:uuid:x0": 3}


def test_stream_warc_matches_batch(spark, tmp_path):
    """availableNow streaming read of a segment directory lands exactly
    the batch documents."""
    from matcha_spark.sources.warc import stream_warc_documents

    path = _write(tmp_path, "seg.warc.gz", gzip.compress(_archive()))
    batch = {(r.doc_id, r.text)
             for r in read_warc_documents(spark, path).collect()}
    got = []
    q = (
        stream_warc_documents(spark, path, max_files_per_trigger=1)
        .writeStream.format("memory").queryName("warc_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {(r.doc_id, r.text)
           for r in spark.sql("select * from warc_stream").collect()}
    assert got == batch and len(got) == 4


def test_stream_warc_feeds_streaming_dedup(spark, tmp_path):
    """Crawl segments dropped into a directory → streaming near-dedup:
    the exact-refetch in a later segment is rejected against the store."""
    from matcha_spark.sources.warc import stream_warc_documents
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    drop = tmp_path / "drop"
    os.makedirs(drop)
    body = ("a perfectly ordinary web page about nothing in particular "
            "that goes on for quite a while " * 3).encode()
    (drop / "seg1.warc").write_bytes(
        _record("response", _http(body), uri="http://x.test/a",
                rec_id="<urn:uuid:a>")
        + _record("response", _http(b"totally different page body here "
                                    b"with its own words entirely"),
                  uri="http://x.test/b", rec_id="<urn:uuid:b>")
    )
    (drop / "seg2.warc").write_bytes(
        _record("response", _http(body), uri="http://x.test/a-refetch",
                rec_id="<urn:uuid:c>")
    )
    decisions = []

    def sink(df, bid):
        decisions.extend((r.doc_id, r.keep) for r in df.collect())

    q = stream_incremental_dedup(
        stream_warc_documents(spark, str(drop), max_files_per_trigger=1),
        str(tmp_path / "store"),
        sink,
        method="simhash",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(10)
    q.processAllAvailable()
    q.stop()
    got = dict(decisions)
    assert got["urn:uuid:a"] is True and got["urn:uuid:b"] is True
    assert got["urn:uuid:c"] is False  # exact refetch, hamming 0
    assert len(got) == 3


def test_warc_to_corpus_build_end_to_end(spark, tmp_path):
    """The complete crawl→training-data path with no staging tables:
    WARC segments → documents → URL-staged curation cascade →
    deterministic shuffle → even parquet shards + manifest."""
    from matcha_spark.operators.text import shard_manifest, write_corpus_shards
    from matcha_spark.pipelines import curate_corpus

    good = ("this is a perfectly reasonable web document with enough "
            "plain words to pass the quality gate of the cascade")
    recs = []
    for i in range(8):
        recs.append(_record(
            "response", _http(f"{good} page {i}".encode()),
            uri=f"https://keep.org/p{i}", rec_id=f"<urn:uuid:k{i}>"))
    recs.append(_record(  # url-duplicate of p0 (tracking param)
        "response", _http(f"{good} page 0 refetched".encode()),
        uri="https://keep.org/p0?utm_source=x", rec_id="<urn:uuid:zd>"))
    recs.append(_record(  # blocked domain
        "response", _http(f"{good} spam variant".encode()),
        uri="https://ads.spam.net/buy", rec_id="<urn:uuid:sp>"))
    recs.append(_record(  # fails quality
        "response", _http(b"!!! ??? ..."),
        uri="https://keep.org/junk", rec_id="<urn:uuid:jk>"))
    path = _write(tmp_path, "crawl-0.warc.gz",
                  b"".join(gzip.compress(r) for r in recs))

    docs = read_warc_documents(spark, path)
    verdicts = curate_corpus(
        docs, min_tokens=5, blocked_domains=["spam.net"], url_dedup=True
    )
    status = {r.doc_id: r.status for r in verdicts.collect()}
    assert status["urn:uuid:sp"] == "blocked_domain"
    assert status["urn:uuid:zd"] == "url_duplicate"
    assert status["urn:uuid:jk"] == "quality"
    kept = docs.join(
        verdicts.where("status = 'kept'").select("doc_id"), "doc_id"
    )
    out = str(tmp_path / "shards")
    n = write_corpus_shards(kept.select("doc_id", "url", "text"), out,
                            rows_per_shard=3)
    assert n == 8
    man = shard_manifest(spark, out).collect()
    assert sum(r.rows for r in man) == 8
    assert max(r.rows for r in man) <= 3
    # the shards ARE the corpus: read back and compare doc ids
    back = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert back == {f"urn:uuid:k{i}" for i in range(8)}


def test_warc_payload_to_image_dedup(spark, tmp_path):
    """with_payload=True bridges crawled binary assets into the media
    family: PNG responses → payload bytes → sniff-decoded pHash →
    near-dup pairs; text stays empty for non-text content types and
    populated for text ones."""
    import numpy as np

    from matcha_spark.operators.codecs import sniff_decode_image, write_png
    from matcha_spark.operators.multimodal import (
        image_phash,
        phash_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    img = (np.arange(256).reshape(16, 16) * 5) % 256
    png_a = write_png(img)
    png_b = write_png(img)           # identical image
    png_c = write_png(img.T[::-1])   # different image
    recs = [
        _record("response", _http(png_a, ctype="image/png"),
                uri="https://pics.test/a.png", rec_id="<urn:uuid:img-a>"),
        _record("response", _http(png_b, ctype="image/png"),
                uri="https://pics.test/b.png", rec_id="<urn:uuid:img-b>"),
        _record("response", _http(png_c, ctype="image/png"),
                uri="https://pics.test/c.png", rec_id="<urn:uuid:img-c>"),
        _record("response", _http(b"<html>a page</html>"),
                uri="https://pics.test/page", rec_id="<urn:uuid:page>"),
    ]
    path = _write(tmp_path, "imgs.warc", b"".join(recs))
    docs = read_warc_documents(spark, path, with_payload=True)
    rows = {r.doc_id: r for r in docs.collect()}
    assert bytes(rows["urn:uuid:img-a"].payload) == png_a
    assert rows["urn:uuid:img-a"].text == ""          # binary: no text
    assert rows["urn:uuid:page"].text == "<html>a page</html>"
    assert bytes(rows["urn:uuid:page"].payload) == b"<html>a page</html>"

    media = docs.where(F.col("content_type") == "image/png").select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        "payload",
    )
    ph = image_phash(media, decoder=sniff_decode_image)
    assert ph.count() == 3
    pairs = {(r.id_a, r.id_b) for r in phash_near_dup_pairs(
        media, decoder=sniff_decode_image, max_hamming=0).collect()}
    assert pairs == {("urn:uuid:img-a", "urn:uuid:img-b")}


def test_gunzip_members_unit():
    m = gzip.compress(b"a") + gzip.compress(b"b")
    out, err = _gunzip_members(m)
    assert (out, err) == (b"ab", None)
    out, err = _gunzip_members(m + b"\x1f\x8bgarbage")
    assert out == b"ab" and err is not None
    out, err = _gunzip_members(zlib.compress(b"zlib, not gzip"))
    assert out == b"" and err.startswith("gzip_error")


def test_warc_parser_never_raises_fuzz():
    """Crawl segments are untrusted bytes: whatever lands in the file,
    the parser yields records/quarantine rows and NEVER raises — random
    garbage, bit-flipped real archives, truncations at every boundary
    class, and hostile header values."""
    import random

    from matcha_spark.sources.warc import _file_records

    rng = random.Random(17)
    arch = _archive()
    cases = []
    # pure garbage, gzip-magic-prefixed garbage, empty
    cases += [b"", b"\x1f\x8b", b"\x1f\x8b\x08\x00junk",
              bytes(rng.randrange(256) for _ in range(512))]
    # truncate a real archive at 40 byte positions
    cases += [arch[:i] for i in range(0, len(arch), max(1, len(arch) // 40))]
    # bit-flip a real archive at 30 random positions
    for _ in range(30):
        b = bytearray(arch)
        for _ in range(3):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    # hostile headers: huge content-length, negative, non-numeric,
    # folded continuation, no colon, binary junk in values
    cases += [
        b"WARC/1.0\r\nContent-Length: 99999999999\r\n\r\nshort\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxx\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: NaN\r\n\r\nxx\r\n\r\n",
        b"WARC/1.0\r\nX: a\r\n  folded\r\nContent-Length: 2\r\n\r\nok\r\n\r\n",
        b"WARC/1.0\r\nno-colon-line\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: 2\r\n\r\nok\r\n\r\nWARC/9.9\xff\xfe",
    ]
    for i, payload in enumerate(cases):
        out = list(_file_records(f"fuzz-{i}", payload))
        for off, rec, reason in out:
            assert (rec is None) != (reason is None)  # exactly one side set
    # negative length is quarantined, not accepted as an empty record
    bad = [r for r in _file_records(
        "neg", b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxx\r\n\r\n")]
    assert bad == [(0, None, "bad_content_length")]
    # gz variants of the same garbage through the member decoder
    for i, payload in enumerate(cases[:20]):
        out = list(_file_records(f"fz-gz-{i}", gzip.compress(payload)))
        for off, rec, reason in out:
            assert (rec is None) != (reason is None)


def test_dechunk_malformed_passthrough():
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    # malformed size token: body returned verbatim, never an exception
    raw = b"zz\r\nnot chunked at all"
    assert _dechunk(raw) == raw


def test_warc_content_encoding_failure_quarantined(spark, tmp_path):
    """r12 advice: a response whose declared gzip body will not inflate
    must NOT flow downstream as replacement-character soup — text is
    empty, warc_malformed reports ``content_encoding_failed``, and in
    payload mode the (still-compressed) bytes are carried as-is while
    text stays empty."""
    import gzip as _gz

    good = _record(
        "response",
        _http(_gz.compress(b"<html>real page</html>"),
              extra="Content-Encoding: gzip\r\n"),
        uri="http://example.com/ok", rec_id="<urn:uuid:ok>",
    )
    bad = _record(
        "response",
        _http(b"\x1f\x8b\x08\x00garbage-not-gzip-stream",
              extra="Content-Encoding: gzip\r\n"),
        uri="http://example.com/bad", rec_id="<urn:uuid:bad>",
    )
    p = tmp_path / "enc.warc"
    p.write_bytes(good + bad)
    from matcha_spark.sources.warc import (
        read_warc_documents,
        warc_malformed,
    )

    docs = {r.doc_id: r for r in read_warc_documents(spark, str(p)).collect()}
    assert docs["urn:uuid:ok"].text == "<html>real page</html>"
    assert docs["urn:uuid:bad"].text == ""
    reasons = {r.reason for r in warc_malformed(spark, str(p)).collect()}
    assert reasons == {"content_encoding_failed"}
    # payload mode: bytes preserved (compressed, as fetched), text empty
    pl = {
        r.doc_id: r
        for r in read_warc_documents(
            spark, str(p), with_payload=True
        ).collect()
    }
    assert pl["urn:uuid:bad"].text == ""
    assert bytes(pl["urn:uuid:bad"].payload).startswith(b"\x1f\x8b")


def test_warc_unhandled_and_empty_content_encodings(spark, tmp_path):
    """r12 advice: (a) a declared non-identity encoding with no decoder
    here (br/deflate/zstd) must quarantine like failed gzip — not fall
    through to charset-decoding compressed bytes; (b) an EMPTY body
    with an encoding declared has nothing to inflate and is NOT a
    failure; (c) gzip that inflates to empty is a success."""
    import gzip as _gz

    br = _record(
        "response",
        _http(b"\x0b\x02\x80compressed-brotli-ish",
              extra="Content-Encoding: br\r\n"),
        uri="http://example.com/br", rec_id="<urn:uuid:br>",
    )
    empty = _record(
        "response",
        _http(b"", extra="Content-Encoding: gzip\r\n"),
        uri="http://example.com/empty", rec_id="<urn:uuid:empty>",
    )
    gz_empty = _record(
        "response",
        _http(_gz.compress(b""), extra="Content-Encoding: gzip\r\n"),
        uri="http://example.com/gzempty", rec_id="<urn:uuid:gzempty>",
    )
    identity = _record(
        "response",
        _http(b"plain text body", extra="Content-Encoding: identity\r\n"),
        uri="http://example.com/id", rec_id="<urn:uuid:id>",
    )
    p = tmp_path / "enc2.warc"
    p.write_bytes(br + empty + gz_empty + identity)
    from matcha_spark.sources.warc import read_warc_documents, warc_malformed

    docs = {r.doc_id: r for r in read_warc_documents(spark, str(p)).collect()}
    assert docs["urn:uuid:br"].text == ""
    assert docs["urn:uuid:empty"].text == ""
    assert docs["urn:uuid:gzempty"].text == ""
    assert docs["urn:uuid:id"].text == "plain text body"
    bad = {
        (r.reason)
        for r in warc_malformed(spark, str(p)).collect()
    }
    # only the br record fails; empty/identity/gzip-of-empty are clean
    assert bad == {"content_encoding_failed"}
    assert warc_malformed(spark, str(p)).count() == 1


def test_doc_warc_ingest_buckets(spark):
    """The r14 oracle entry (held back to r15) end-to-end at sf0.001:
    the serializer's three corruption classes land where they should —
    bad_content_length records never become documents but RESYNC keeps
    their successors parseable, encoding-failed records are emitted
    with empty text AND audited, and good records round-trip text and
    record-id char-exactly (the sum_ids check)."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"
    got = {r.bucket: (r.n_rows, r.total_chars, r.sum_ids)
           for r in suite.doc_warc_ingest(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cls = docs.select(
        F.coalesce("lang", F.lit("xx")).alias("lang"),
        "doc_id",
        F.when(F.col("doc_id") % 23 == 0, F.lit("bad_content_length"))
        .when((F.col("doc_id") % 23 == 1) | F.col("text").isNull(),
              F.lit("content_encoding_failed"))
        .otherwise(F.lit("good")).alias("cls"),
        F.length("text").alias("chars"),
    )
    want = {}
    for r in cls.where("cls <> 'bad_content_length'").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("cls") == "good", F.col("chars"))
              .otherwise(F.lit(0))).alias("c"),
        F.sum("doc_id").alias("s"),
    ).collect():
        want[f"lang:{r.lang}"] = (r.n, r.c, r.s)
    for r in cls.where("cls <> 'good'").groupBy("cls").agg(
        F.count(F.lit(1)).alias("n")
    ).collect():
        want[f"quarantine:{r.cls}"] = (r.n, None, None)
    assert got == want
    assert "quarantine:bad_content_length" in got
    assert "quarantine:content_encoding_failed" in got
