"""Raw-corpus ingestion sources (r11): JSONL with distributed
quarantine, whole-file/line text, streaming JSONL parity."""

import json
import os

from matcha_spark.sources.corpus import (
    jsonl_quarantine,
    read_jsonl_documents,
    read_text_documents,
    stream_jsonl_documents,
)


def _write_corpus(tmp_path):
    a = tmp_path / "shard_a.jsonl"
    b = tmp_path / "shard_b.jsonl"
    a.write_text(
        "\n".join(
            [
                json.dumps({"text": "alpha doc", "id": "d1", "lang": "en", "score": 0.5}),
                "",  # blank: ignored outright
                json.dumps({"text": "beta doc", "id": "d2", "lang": "fr", "score": 1.5}),
                "{not valid json",  # malformed: quarantined
            ]
        )
    )
    b.write_text(
        "\n".join(
            [
                json.dumps({"id": "d3", "lang": "de"}),  # missing text: quarantined
                json.dumps({"text": "gamma doc", "id": "d4"}),
            ]
        )
    )
    return str(tmp_path)


def test_read_jsonl_documents(spark, tmp_path):
    path = _write_corpus(tmp_path)
    docs = read_jsonl_documents(
        spark,
        path,
        id_field="id",
        extra_fields={"lang": "string", "score": "double"},
    )
    assert [f.name for f in docs.schema] == ["doc_id", "text", "source", "lang", "score"]
    assert dict(docs.dtypes)["score"] == "double"
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"d1", "d2", "d4"}
    assert rows["d1"].text == "alpha doc" and rows["d1"].score == 0.5
    assert rows["d4"].lang is None and rows["d4"].source == "shard_b.jsonl"

    # quarantine: the two bad lines, with reasons, never a job failure
    q = {r.reason: r for r in jsonl_quarantine(
        spark, path, id_field="id",
        extra_fields={"lang": "string", "score": "double"},
    ).collect()}
    assert set(q) == {"malformed_json", "missing_text"}
    assert q["malformed_json"].line == "{not valid json"
    assert q["malformed_json"].file.endswith("shard_a.jsonl")
    assert json.loads(q["missing_text"].line)["id"] == "d3"


def test_read_jsonl_content_addressed_ids(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    line = json.dumps({"text": "same doc"})
    p.write_text("\n".join([line, line, json.dumps({"text": "other"})]))
    docs = read_jsonl_documents(spark, str(p))
    got = docs.collect()
    assert len(got) == 3  # ids are content-addressed, rows not deduped
    ids = {r.text: r.doc_id for r in got}
    assert len({r.doc_id for r in got}) == 2  # identical lines share an id
    assert ids["same doc"] != ids["other"]
    # deterministic across re-reads (pure function of the line)
    again = {r.text: r.doc_id for r in read_jsonl_documents(spark, str(p)).collect()}
    assert again == ids


def test_read_jsonl_coercions(spark, tmp_path):
    """Pin the parser's edges: unicode round-trips byte-exact; a JSON
    OBJECT under a string-typed field is re-serialized (not
    quarantined); scalar non-strings coerce to their JSON text; huge
    lines parse."""
    p = tmp_path / "edge.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"text": "héllo wörld é中文", "meta": {"a": 1}}),
                json.dumps({"text": "big " * 100000}),
                json.dumps({"text": 42}),
            ]
        )
    )
    docs = read_jsonl_documents(spark, str(p), extra_fields={"meta": "string"})
    rows = sorted(docs.collect(), key=lambda r: len(r.text))
    assert rows[0].text == "42"
    assert rows[1].text == "héllo wörld é中文" and rows[1].meta == '{"a":1}'
    assert len(rows[2].text) == 4 * 100000
    assert jsonl_quarantine(
        spark, str(p), extra_fields={"meta": "string"}
    ).count() == 0


def test_read_text_documents(spark, tmp_path):
    d = tmp_path / "txt"
    os.makedirs(d)
    (d / "one.txt").write_text("first file\nsecond line")
    (d / "two.txt").write_text("another document")
    whole = {r.doc_id: r.text for r in read_text_documents(spark, str(d)).collect()}
    assert whole == {
        "one.txt": "first file\nsecond line",
        "two.txt": "another document",
    }
    lines = read_text_documents(spark, str(d), wholetext=False).collect()
    assert {r.text for r in lines} == {"first file", "second line", "another document"}
    assert all(len(r.doc_id) == 32 for r in lines)  # md5 hex


def test_jsonl_to_curation_to_mixture(spark, tmp_path):
    """End-to-end: raw JSONL shards → quarantine-safe ingest →
    curation cascade → temperature-balanced mixture — the full
    front-half of a training-data pipeline with no parquet staging."""
    from matcha_spark.operators.text import temperature_mixture
    from matcha_spark.pipelines import curate_corpus

    good = "this is a perfectly reasonable document with enough plain words to pass the quality gate"
    shard = tmp_path / "raw.jsonl"
    shard.write_text(
        "\n".join(
            [json.dumps({"text": good + f" copy tag {i}", "id": f"web{i}", "src": "web"}) for i in range(8)]
            + [json.dumps({"text": good + " wiki variant", "id": "wiki0", "src": "wiki"})]
            + [json.dumps({"text": good + " wiki variant", "id": "wiki1", "src": "wiki"})]  # dup
            + [json.dumps({"text": "!!! ??? ...", "id": "junk", "src": "web"})]  # fails quality
            + ["{broken"]
        )
    )
    docs = read_jsonl_documents(spark, str(shard), id_field="id", source_field="src")
    verdicts = curate_corpus(docs, min_tokens=5)
    status = {r.doc_id: r.status for r in verdicts.collect()}
    assert status["junk"] == "quality"
    assert sorted(status[k] for k in ("wiki0", "wiki1")) == ["duplicate", "kept"]
    kept = docs.join(verdicts.where("status = 'kept'").select("doc_id"), "doc_id")
    mixed = temperature_mixture(kept, alpha=0.0)
    per = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    # alpha=0 equalizes expected counts toward the smallest group (wiki: 1
    # kept doc) — wiki survives whole, web is down-sampled at rate 1/8
    assert per.get("wiki") == 1
    assert per.get("web", 0) <= 4


def test_stream_jsonl_feeds_streaming_dedup(spark, tmp_path):
    """The composition the docs promise: a JSONL drop-directory →
    stream_jsonl_documents → stream_incremental_dedup — near-dup
    admissions decided per micro-batch, duplicate rejected."""
    from matcha_spark.streaming.dedup import stream_incremental_dedup

    drop = tmp_path / "drop"
    os.makedirs(drop)
    base = ("a perfectly ordinary training document about nothing in "
            "particular that goes on for a while " * 3)
    (drop / "b0.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"text": base + "original", "id": "keep0"}),
                # near-dup; id sorts AFTER keep0 (min-id keeper wins)
                json.dumps({"text": base + "originaI", "id": "zdup0"}),
                json.dumps({"text": "completely different content here " * 6, "id": "keep1"}),
                "{broken line",
            ]
        )
    )
    stream = stream_jsonl_documents(spark, str(drop), id_field="id")
    decisions = []

    def sink(df, bid):
        decisions.extend((r.doc_id, r.keep) for r in df.collect())

    # measured signature distances on these fixed texts: planted pair
    # at Hamming 6, unrelated pairs at 28/32 — max_hamming=8 separates
    q = stream_incremental_dedup(
        stream,
        str(tmp_path / "store"),
        sink,
        method="simhash",
        max_hamming=8,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(10)
    q.processAllAvailable()
    q.stop()
    got = dict(decisions)
    assert got["keep0"] is True and got["keep1"] is True
    assert got["zdup0"] is False
    assert len(got) == 3  # the broken line never reached the dedupper


def test_stream_jsonl_matches_batch(spark, tmp_path):
    """availableNow streaming read lands exactly the batch rows."""
    path = _write_corpus(tmp_path)
    stream = stream_jsonl_documents(
        spark, path, id_field="id", extra_fields={"lang": "string"}
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.text, r.source, r.lang)
        for r in spark.sql("SELECT * FROM jsonl_stream_t").collect()
    }
    want = {
        (r.doc_id, r.text, r.source, r.lang)
        for r in read_jsonl_documents(
            spark, path, id_field="id", extra_fields={"lang": "string"}
        ).collect()
    }
    assert got == want and len(want) == 3


def test_read_csv_documents(spark, tmp_path):
    """CSV source: header dropped, typed extras, TSV via sep, id/source
    fallbacks matching the JSONL reader."""
    from matcha_spark.sources.corpus import csv_quarantine, read_csv_documents

    p = tmp_path / "docs.csv"
    p.write_text(
        "id,text,score\n"
        "a,hello world,1.5\n"
        '"b","quoted, text",2.0\n'
        "c,,9.9\n"            # NULL text -> quarantined
        "d,bad-score,oops\n"  # type corruption -> quarantined
    )
    fields = {"id": "string", "text": "string", "score": "double"}
    docs = {
        r.doc_id: r
        for r in read_csv_documents(
            spark, str(p), fields=fields, id_field="id"
        ).collect()
    }
    assert set(docs) == {"a", "b"}
    assert docs["a"].text == "hello world" and docs["a"].score == 1.5
    assert docs["b"].text == "quoted, text"
    assert docs["a"].source == "docs.csv"
    q = {r.reason for r in csv_quarantine(spark, str(p), fields=fields).collect()}
    assert "missing_text" in q and "malformed_csv" in q

    # header variants (r12 advice): spacing, partial/mixed quoting, and
    # column reorder are all recognized as headers and dropped rather
    # than parsed into bogus all-string documents
    v = tmp_path / "variants.csv"
    v.write_text(
        "id, text ,score\n"          # spacing
        '"id",text,"score"\n'        # partial quoting
        "text,id,score\n"            # reordered
        "e,real row,3.0\n"
    )
    vdocs = read_csv_documents(
        spark, str(v), fields=fields, id_field="id"
    ).collect()
    assert [(r.doc_id, r.text) for r in vdocs] == [("e", "real row")]
    vq = csv_quarantine(spark, str(v), fields=fields).collect()
    assert vq == []  # header variants are dropped, never quarantined

    # TSV + no header + content-addressed ids
    t = tmp_path / "docs.tsv"
    t.write_text("first doc\t0.1\nsecond doc\t0.2\n")
    rows = read_csv_documents(
        spark,
        str(t),
        fields={"text": "string", "w": "double"},
        sep="\t",
        header=False,
    ).collect()
    assert sorted(r.text for r in rows) == ["first doc", "second doc"]
    assert all(len(r.doc_id) == 32 for r in rows)  # md5 fallback


def test_stream_csv_matches_batch(spark, tmp_path):
    """The streaming CSV twin produces exactly the batch reader's rows."""
    from matcha_spark.sources.corpus import (
        read_csv_documents,
        stream_csv_documents,
    )

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.csv").write_text("text\nalpha doc\nbeta doc\n")
    (d / "b.csv").write_text("text\ngamma doc\n")
    batch = {
        (r.doc_id, r.text, r.source)
        for r in read_csv_documents(spark, str(d)).collect()
    }
    stream = stream_csv_documents(spark, str(d))
    assert stream.isStreaming
    out = (
        stream.writeStream.format("memory")
        .queryName("csv_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(60)
    got = {
        (r.doc_id, r.text, r.source)
        for r in spark.sql("SELECT * FROM csv_stream_test").collect()
    }
    assert got == batch and len(got) == 3


def test_csv_source_untrusted_lines_fuzz(spark, tmp_path):
    """Corpus CSV is untrusted text: whatever the lines contain, the
    reader never raises, and good rows + quarantine rows exactly
    partition the non-blank non-header lines."""
    import random

    from matcha_spark.sources.corpus import csv_quarantine, read_csv_documents

    rng = random.Random(7)
    lines = ["id,text,score"]
    for i in range(40):
        r = rng.random()
        if r < 0.3:
            lines.append(f"ok{i},doc {i},{i}.5")
        elif r < 0.5:
            lines.append(f"bad{i},text,{rng.choice(['x', '--', '1e', ''])}a")
        elif r < 0.6:
            lines.append(",,")
        elif r < 0.7:
            lines.append('"unterminated,quote %d' % i)
        elif r < 0.8:
            lines.append("")  # blank: ignored outright
        else:
            lines.append(
                "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(20))
            )
    p = tmp_path / "fuzz.csv"
    p.write_text("\n".join(lines) + "\n")
    fields = {"id": "string", "text": "string", "score": "double"}
    good = read_csv_documents(spark, str(p), fields=fields, id_field="id").collect()
    quar = csv_quarantine(spark, str(p), fields=fields).collect()
    n_nonblank = sum(1 for l in lines[1:] if l.strip())
    # partition property: every surviving line is exactly one of the two
    assert len(good) + len(quar) == n_nonblank
    assert all(r.text is not None for r in good)


def test_stream_csv_feeds_curation_cascade(spark, tmp_path):
    """CSV drop-directory → the full streaming curation cascade
    (blocklist → url dedup → quality → dedup-vs-store): the new source
    composes with the capstone pipeline with zero seams — the refetch
    in a later file is rejected against the persisted store, the
    blocked domain never reaches dedup."""
    import os

    from matcha_spark.sources.corpus import stream_csv_documents
    from matcha_spark.streaming.curate import stream_curate

    drop = tmp_path / "drop"
    os.makedirs(drop)
    body = (
        "a perfectly ordinary document about nothing in particular "
        "that goes on for quite a while and then some more words"
    )
    (drop / "f1.csv").write_text(
        "id,url,text\n"
        f'a,http://ok.test/a,"{body}"\n'
        'b,http://spam.test/x,"spam page body that is long enough to '
        'pass any quality gate easily with many words"\n'
    )
    (drop / "f2.csv").write_text(
        "id,url,text\n"
        f'c,http://ok.test/a-refetch,"{body}"\n'
    )
    fields = {"id": "string", "url": "string", "text": "string"}
    decisions = []

    def sink(df, bid):
        decisions.extend((r.doc_id, r.status) for r in df.collect())

    q = stream_curate(
        stream_csv_documents(
            spark, str(drop), fields=fields, id_field="id",
            max_files_per_trigger=1,
        ),
        str(tmp_path / "store"),
        sink,
        blocked_domains=["spam.test"],
        dedup="exact",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(10)
    q.processAllAvailable()
    q.stop()
    got = dict(decisions)
    assert got["a"] == "kept"
    assert got["b"] == "blocked_domain"
    assert got["c"] == "duplicate"  # exact refetch vs the store
    assert len(got) == 3


def test_jsonl_write_read_roundtrip(spark, tmp_path):
    """write_jsonl_documents is the exact sink inverse of
    read_jsonl_documents: every string survives the JSON escape/
    unescape byte-for-byte (quotes, backslashes, newlines, tabs,
    non-ASCII), typed extras keep their types, a NULL text field is
    omitted from its line and surfaces as the reader's missing_text
    quarantine, and the gzip codec produces a readable .gz drop
    directory."""
    from matcha_spark.sources.corpus import (
        jsonl_quarantine,
        read_jsonl_documents,
        write_jsonl_documents,
    )

    rows = [
        ("a", 'he said "hi" \\ bye', "en", 1.5),
        ("b", "line\nbreak\ttab", "de", -0.25),
        ("c", "café über 中文 \U0001f600", "zh", 0.0),
        ("d", "", "es", 99.0),          # empty string is a value, not null
        ("e", None, "fr", 3.5),          # null text -> quarantined
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, score double"
    )
    out = str(tmp_path / "out")
    write_jsonl_documents(docs, out)
    kw = dict(
        id_field="doc_id", extra_fields={"lang": "string", "score": "double"}
    )
    back = {
        (r.doc_id, r.text, r.lang, r.score)
        for r in read_jsonl_documents(spark, out, **kw).collect()
    }
    assert back == {(i, t, l, s) for i, t, l, s in rows if t is not None}
    q = jsonl_quarantine(spark, out, **kw).collect()
    assert [r.reason for r in q] == ["missing_text"]
    assert '"doc_id":"e"' in q[0].line and "text" not in q[0].line

    # gzip codec: .gz part files, identical content back
    gz = str(tmp_path / "gz")
    write_jsonl_documents(docs, gz, compression="gzip")
    import glob as _g

    assert _g.glob(f"{gz}/part-*.gz")
    assert {
        (r.doc_id, r.text) for r in read_jsonl_documents(spark, gz, **kw).collect()
    } == {(i, t) for i, t, _, _ in rows if t is not None}

    # column selection + append mode
    sel = str(tmp_path / "sel")
    write_jsonl_documents(docs.where("text IS NOT NULL"), sel,
                          line_cols=("doc_id", "text"))
    one = read_jsonl_documents(spark, sel, id_field="doc_id").collect()
    assert {r.doc_id for r in one} == {"a", "b", "c", "d"}
    assert set(one[0].asDict()) == {"doc_id", "text", "source"}


def test_jsonl_source_untrusted_lines_fuzz(spark, tmp_path):
    """Corpus JSONL is untrusted text (the CSV twin of this battery
    landed in r12): whatever the lines contain — valid objects,
    truncated JSON, bare scalars, unicode noise — the reader never
    raises, and good rows + quarantine rows exactly partition the
    non-blank lines."""
    import json as _json
    import random

    from matcha_spark.sources.corpus import (
        jsonl_quarantine,
        read_jsonl_documents,
    )

    rng = random.Random(13)
    lines = []
    for i in range(60):
        r = rng.random()
        if r < 0.3:
            lines.append(_json.dumps(
                {"id": f"ok{i}", "text": f'doc {i} "quoted" \\ {chr(0x2014)}',
                 "lang": rng.choice(["en", "de"])}))
        elif r < 0.45:
            full = _json.dumps({"id": f"t{i}", "text": "x" * i})
            lines.append(full[: len(full) // 2])      # truncated JSON
        elif r < 0.55:
            lines.append(_json.dumps({"id": f"m{i}", "lang": "fr"}))  # no text
        elif r < 0.65:
            lines.append(rng.choice(["[1,2,3]", "42", '"bare string"',
                                     "true", "null"]))  # non-object JSON
        elif r < 0.75:
            lines.append("")  # blank: ignored outright
        else:
            lines.append(
                "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(20))
            )
    p = tmp_path / "fuzz.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    kw = dict(id_field="id", extra_fields={"lang": "string"})
    good = read_jsonl_documents(spark, str(p), **kw).collect()
    quar = jsonl_quarantine(spark, str(p), **kw).collect()
    n_nonblank = sum(1 for l in lines if l.strip())
    assert len(good) + len(quar) == n_nonblank
    assert all(r.text is not None for r in good)
    assert {r.reason for r in quar} <= {"malformed_json", "missing_text"}
    # every valid full object with text came through intact
    want = {l.split('"id": "')[1].split('"')[0]
            for l in lines if l.startswith('{"id": "ok')}
    assert {r.doc_id for r in good} >= want


def test_csv_header_lines_audit(spark, tmp_path):
    """r13 advice: header elimination must leave an audit trail.  The
    dropped set — the real header AND any data row whose normalized
    fields coincide with the header-name multiset (any order, any
    quoting) — is exactly what ``csv_header_lines`` returns, and
    good + quarantine + header-dropped partitions the non-blank
    lines."""
    from matcha_spark.sources.corpus import (
        csv_header_lines,
        csv_quarantine,
        read_csv_documents,
    )

    lines = [
        "id,text,score",          # the header
        "a,hello,1.5",            # good
        'text, id ,"score"',      # data row == header multiset, reordered
        "b,world,oops",           # bad score -> malformed
        "c,,2.0",                 # empty text -> missing_text
    ]
    p = tmp_path / "h.csv"
    p.write_text("\n".join(lines) + "\n")
    fields = {"id": "string", "text": "string", "score": "double"}
    good = read_csv_documents(spark, str(p), fields=fields, id_field="id").collect()
    quar = csv_quarantine(spark, str(p), fields=fields).collect()
    hdr = csv_header_lines(spark, str(p), fields=fields).collect()
    assert {r.doc_id for r in good} == {"a"}
    assert {r.reason for r in quar} == {"malformed_csv", "missing_text"}
    assert sorted(r.line for r in hdr) == ["id,text,score", 'text, id ,"score"']
    assert len(good) + len(quar) + len(hdr) == len(lines)


def test_doc_csv_ingest_buckets(spark):
    """The r14 oracle entry end-to-end at sf0.001: bucket classes are
    complete (every lang + both quarantine reasons + the header audit),
    counts reconcile to the table size + 1 header line, and the good
    char totals see the decorated text (len + 3) — i.e. the ,"\\ suffix
    survived CSV quoting char-exactly."""
    from pyspark.sql import functions as F

    from matcha_spark import suite

    sf = "/root/testdata/sf0.001"
    got = {r.bucket: (r.n_rows, r.total_chars)
           for r in suite.doc_csv_ingest(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cls = docs.select(
        "lang",
        F.when(F.col("doc_id") % 23 == 0, F.lit("malformed_csv"))
        .when((F.col("doc_id") % 23 == 1) | F.col("text").isNull(),
              F.lit("missing_text"))
        .otherwise(F.lit("good")).alias("cls"),
        (F.length("text") + 3).alias("dec_len"),
    )
    want = {"header:dropped": (1, None)}
    for r in cls.where("cls = 'good'").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dec_len").alias("c")
    ).collect():
        want[f"lang:{r.lang}"] = (r.n, r.c)
    for r in cls.where("cls <> 'good'").groupBy("cls").agg(
        F.count(F.lit(1)).alias("n")
    ).collect():
        want[f"quarantine:{r.cls}"] = (r.n, None)
    assert got == want
    assert sum(n for n, _ in got.values()) == docs.count() + 1
