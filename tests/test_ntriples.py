"""N-Triples source/sink: lossless round-trip of every TERM kind, file
I/O, and parsing of externally-written N-Triples."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from matcha_spark.sources.ntriples import (
    ntlines_to_triples,
    read_ntriples,
    triples_to_ntlines,
    write_ntriples,
)
from matcha_spark.terms import (
    TRIPLE_SCHEMA,
    LangString,
    RDFLiteral,
    URI,
    from_term,
    kw,
    to_term,
)

VALUES = [
    URI("http://example.org/a"),
    kw(":foaf/knows"),
    kw(":label"),
    "plain",
    'tricky "quoted" \\n literal-backslash-n',
    "real\nnewline\tand\ttab plus \\ backslash and trailing \\\\ pair",
    "unicode: héllo wörld — ∀x∈ℝ",
    "",
    42,
    -7,
    3.5,
    -0.25,
    1e20,
    True,
    False,
    None,
    LangString("bonjour", "fr"),
    LangString("hello", "en-GB"),
    RDFLiteral("P1Y2M", "http://www.w3.org/2001/XMLSchema#duration"),
    dt.date(2024, 2, 29),
    dt.datetime(2024, 2, 29, 12, 34, 56, 789012),
    dt.datetime(2024, 2, 29, 12, 34, 56, 789012, tzinfo=dt.timezone.utc),
]


def _mk_db(spark):
    triples = []
    for i, v in enumerate(VALUES):
        triples.append((to_term(URI(f"urn:s{i}")), to_term(kw(":p")), to_term(v)))
        # any kind is legal in any position (matcha triples are untyped:
        # reference src/grafter/matcha/alpha.clj:54-58)
        triples.append((to_term(v), to_term(v), to_term(v)))
    return spark.createDataFrame(triples, TRIPLE_SCHEMA)


def _decoded_set(db):
    return {
        (repr(from_term(r.s)), repr(from_term(r.p)), repr(from_term(r.o)))
        for r in db.collect()
    }


def test_roundtrip_all_kinds_in_memory(spark):
    db = _mk_db(spark)
    back = ntlines_to_triples(triples_to_ntlines(db))
    assert _decoded_set(back) == _decoded_set(db)


def test_roundtrip_through_files(spark, tmp_path):
    db = _mk_db(spark)
    path = str(tmp_path / "graph.nt")
    write_ntriples(db, path)
    back = read_ntriples(spark, path)
    assert _decoded_set(back) == _decoded_set(db)


def test_num_mirror_reconstructed(spark):
    """The num field (join mirror for int/double/bool/date) must survive
    the trip — doubles join by num, so a zeroed mirror would break
    equality joins on round-tripped graphs."""
    db = _mk_db(spark)
    back = ntlines_to_triples(triples_to_ntlines(db))
    orig = {(r.o["kind"], r.o["lex"], r.o["num"]) for r in db.collect()}
    got = {(r.o["kind"], r.o["lex"], r.o["num"]) for r in back.collect()}
    assert got == orig


def test_parse_external_ntriples(spark):
    """Hand-written (non-engine) N-Triples parse: IRIs, plain/lang/typed
    literals, comments, blank lines, ECHAR escapes."""
    lines = [
        "# a comment line",
        "",
        "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .",
        '<http://ex.org/s> <http://ex.org/name> "Alice" .',
        '<http://ex.org/s> <http://ex.org/greet> "bonjour"@fr .',
        '<http://ex.org/s> <http://ex.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://ex.org/s> <http://ex.org/note> "line1\\nline2 \\"q\\" \\\\" .',
        "   ",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = ntlines_to_triples(df)
    rows = {(from_term(r.s), from_term(r.p), from_term(r.o)) for r in out.collect()}
    assert (URI("http://ex.org/s"), URI("http://ex.org/p"), URI("http://ex.org/o")) in rows
    assert (URI("http://ex.org/s"), URI("http://ex.org/name"), "Alice") in rows
    assert (URI("http://ex.org/s"), URI("http://ex.org/greet"), LangString("bonjour", "fr")) in rows
    assert (URI("http://ex.org/s"), URI("http://ex.org/age"), 42) in rows
    assert (URI("http://ex.org/s"), URI("http://ex.org/note"), 'line1\nline2 "q" \\') in rows
    assert len(rows) == 5  # comments/blanks dropped


def test_malformed_lines_dropped(spark):
    df = spark.createDataFrame(
        [("<a> <b> .",), ("not a triple",), ("<http://s> <http://p> <http://o> .",)],
        "value string",
    )
    out = ntlines_to_triples(df)
    assert out.count() == 1


def test_queryable_after_roundtrip(spark):
    """Round-tripped graphs answer BGP queries identically — the num
    mirror and struct equality survive serialization."""
    from matcha_spark.query import select

    triples = [
        (kw(":rick"), kw(":age"), 60),
        (kw(":morty"), kw(":age"), 14),
        (kw(":rick"), kw(":score"), 3.5),
    ]
    db = spark.createDataFrame(
        [tuple(to_term(x) for x in t) for t in triples], TRIPLE_SCHEMA
    )
    back = ntlines_to_triples(triples_to_ntlines(db))
    who = select(["?s"], [("?s", kw(":age"), 60)], back)
    assert who == [kw(":rick")]
    scored = select(["?s"], [("?s", kw(":score"), 3.5)], back)
    assert scored == [kw(":rick")]


def test_streaming_ntriples_ingestion(spark, tmp_path):
    """The NT parser is a narrow map, so it composes with readStream
    unchanged — a 100 TB dump directory can stream-ingest file-by-file."""
    from matcha_spark.sources.ntriples import ntlines_to_triples, write_ntriples

    db = _mk_db(spark)
    path = str(tmp_path / "stream_nt")
    write_ntriples(db, path)
    src = spark.readStream.format("text").load(path)
    parsed = ntlines_to_triples(src)
    assert parsed.isStreaming
    q = (
        parsed.writeStream.format("memory")
        .queryName("nt_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _decoded_set(spark.table("nt_stream"))
    assert got == _decoded_set(db)


def test_malformed_audit_complements_parse(spark):
    """ntlines_malformed + ntlines_to_triples partition the non-blank,
    non-comment input exactly: nothing silently vanishes."""
    from matcha_spark.sources.ntriples import ntlines_malformed

    lines = [
        "# comment",
        "",
        "<http://s> <http://p> <http://o> .",
        "<unclosed <http://p> <http://o> .",
        "no angle brackets at all",
        '<http://s> <http://p> "ok" .',
        '<http://s> <http://p> "unterminated .',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    good = ntlines_to_triples(df).count()
    bad = ntlines_malformed(df).count()
    assert good == 2
    assert bad == 3
    assert good + bad == 5  # = non-blank, non-comment lines


def test_fuzz_string_roundtrip(spark):
    """200 seeded adversarial strings (escape chars, unicode, quotes,
    backslash runs, control chars) must round-trip byte-exactly through
    serialize → parse in one Spark job."""
    import random

    rng = random.Random(20260813)
    alphabet = list('abc"\\\n\r\t é中\U0001f600<>@^#.%:') + ["\\\\", '\\"', "\\n"]
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(200)
    ]
    triples = [
        (to_term(URI(f"urn:f{i}")), to_term(kw(":v")), to_term(s))
        for i, s in enumerate(strings)
    ]
    db = spark.createDataFrame(triples, TRIPLE_SCHEMA)
    back = ntlines_to_triples(triples_to_ntlines(db))
    got = {r.s["lex"]: r.o["lex"] for r in back.collect()}
    want = {f"urn:f{i}": s for i, s in enumerate(strings)}
    assert got == want


def test_unbound_marker_roundtrip(spark):
    """Graphs holding unbound markers (a construct over optionals can
    produce them) must serialize to well-formed lines and round-trip —
    not silently emit malformed NULL-element lines."""
    from matcha_spark.sources.ntriples import ntlines_malformed
    from matcha_spark.terms import Unbound

    db = spark.createDataFrame(
        [(to_term(URI("urn:s")), to_term(kw(":p")), to_term(Unbound(7)))],
        TRIPLE_SCHEMA,
    )
    lines = triples_to_ntlines(db)
    assert ntlines_malformed(lines).count() == 0
    back = ntlines_to_triples(lines).collect()
    assert len(back) == 1
    o = back[0].o
    assert (o["kind"], o["lex"], o["num"]) == ("unbound", "_7", 7.0)


def test_bnode_roundtrip_and_external_parse(spark):
    """Blank nodes: third-party `_:label` lines parse to bnode terms (not
    malformed), engine round-trip is lossless in every position, and
    unsafe labels / predicate position fall back to the IRI form."""
    from matcha_spark.sources.ntriples import ntlines_malformed
    from matcha_spark.terms import BNode

    lines = [
        "_:b0 <http://ex.org/p> _:b1 .",
        '_:genid-1.x <http://ex.org/name> "Anon" .',
        "<http://ex.org/s> <http://ex.org/link> _:b0 .",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    assert ntlines_malformed(df).count() == 0
    rows = {
        (from_term(r.s), from_term(r.p), from_term(r.o))
        for r in ntlines_to_triples(df).collect()
    }
    assert (BNode("b0"), URI("http://ex.org/p"), BNode("b1")) in rows
    assert (BNode("genid-1.x"), URI("http://ex.org/name"), "Anon") in rows
    assert (URI("http://ex.org/s"), URI("http://ex.org/link"), BNode("b0")) in rows

    # engine round-trip: safe + unsafe labels, all three positions
    weird = BNode("has space & unicode é")
    db = spark.createDataFrame(
        [
            (to_term(BNode("b0")), to_term(kw(":p")), to_term(BNode("b1"))),
            (to_term(weird), to_term(weird), to_term(weird)),
        ],
        TRIPLE_SCHEMA,
    )
    out_lines = triples_to_ntlines(db)
    assert ntlines_malformed(out_lines).count() == 0
    texts = [r.value for r in out_lines.collect()]
    assert any(t.startswith("_:b0 ") and t.rstrip(" .").endswith("_:b1") for t in texts)
    back = ntlines_to_triples(out_lines)
    assert _decoded_set(back) == _decoded_set(db)


def test_bnode_queryable(spark):
    """bnode terms are first-class joinable values in BGP queries."""
    from matcha_spark.query import select
    from matcha_spark.terms import BNode

    db = spark.createDataFrame(
        [
            (to_term(BNode("b0")), to_term(kw(":age")), to_term(60)),
            (to_term(kw(":rick")), to_term(kw(":addr")), to_term(BNode("b0"))),
        ],
        TRIPLE_SCHEMA,
    )
    assert select(["?s"], [("?s", kw(":addr"), BNode("b0"))], db) == [kw(":rick")]
    got = select(["?a"], [(kw(":rick"), kw(":addr"), "?a"), ("?a", kw(":age"), 60)], db)
    assert got == [BNode("b0")]


def test_reserved_prefix_uri_roundtrip(spark):
    """A genuine URI under the reserved urn:matcha: scheme must survive
    the trip as a URI (escaped, not re-parsed as an encoded term)."""
    tricky = [
        URI("urn:matcha:str:x"),
        URI("urn:matcha:kw:foo/bar"),
        URI("urn:matcha:null"),
        URI("urn:matcha:something-else"),
    ]
    db = spark.createDataFrame(
        [(to_term(u), to_term(kw(":p")), to_term(u)) for u in tricky],
        TRIPLE_SCHEMA,
    )
    back = ntlines_to_triples(triples_to_ntlines(db))
    assert _decoded_set(back) == _decoded_set(db)


def test_unsafe_datatype_and_lang_fall_back_to_iri_form(spark):
    """Datatype IRIs containing '>'/whitespace and out-of-grammar lang
    tags can't be rendered as literals; they must fall back to the
    urn:matcha: IRI form (never emit a malformed line) and round-trip."""
    from matcha_spark.sources.ntriples import ntlines_malformed
    from matcha_spark.terms import LangString, RDFLiteral

    vals = [
        RDFLiteral("x", "http://ex.org/weird>dt with space"),
        RDFLiteral("y", ""),
        LangString("hola", "es_MX"),  # underscore: outside BCP-ish grammar
        LangString("hi", "1en"),  # leading digit
    ]
    db = spark.createDataFrame(
        [(to_term(URI(f"urn:s{i}")), to_term(kw(":p")), to_term(v)) for i, v in enumerate(vals)],
        TRIPLE_SCHEMA,
    )
    lines = triples_to_ntlines(db)
    assert ntlines_malformed(lines).count() == 0
    back = ntlines_to_triples(lines)
    assert _decoded_set(back) == _decoded_set(db)


def test_huge_int_num_mirror_clamped(spark):
    """Ints beyond double range carry num=0.0 from to_term; the parser
    must reconstruct 0.0 (not Infinity) so the structs stay equal."""
    huge = 10 ** 400
    db = spark.createDataFrame(
        [(to_term(URI("urn:s")), to_term(kw(":p")), to_term(huge))],
        TRIPLE_SCHEMA,
    )
    assert db.collect()[0].o["num"] == 0.0
    back = ntlines_to_triples(triples_to_ntlines(db)).collect()
    o = back[0].o
    assert (o["kind"], o["lex"], o["num"]) == ("int", str(huge), 0.0)
    assert from_term(o) == huge


def test_read_ntriples_gzip(spark, tmp_path):
    """Compressed dumps read transparently (spark.read.text handles
    .gz) — the common shape real RDF exports arrive in."""
    import gzip

    from matcha_spark.sources.ntriples import read_ntriples
    from matcha_spark.terms import from_term, kw

    lines = (
        '<urn:a> <urn:p> "hello" .\n'
        '<urn:a> <urn:p> <urn:b> .\n'
        '_:b0 <urn:p> "from blank" .\n'
    )
    p = tmp_path / "dump.nt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write(lines)
    t = read_ntriples(spark, str(p))
    assert t.count() == 3
    objs = {from_term(r["o"]) for r in t.collect()}
    assert "hello" in objs and "from blank" in objs


def test_streaming_ntriples_ingestion(spark, tmp_path):
    """ntlines_to_triples is pure narrow maps, so it runs unchanged on
    a readStream text source — graph ingestion from a landing directory
    without a batch rewrite."""
    from matcha_spark.sources.ntriples import ntlines_to_triples

    src_dir = tmp_path / "landing"
    src_dir.mkdir()
    (src_dir / "part1.nt").write_text(
        '<urn:s1> <urn:p> "one" .\n<urn:s2> <urn:p> "two" .\n'
    )
    stream = spark.readStream.format("text").load(str(src_dir))
    triples = ntlines_to_triples(stream)
    q = (
        triples.writeStream.format("memory")
        .queryName("nt_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM nt_stream_t").collect()
    assert len(rows) == 2
    assert {r["o"]["lex"] for r in rows} == {"one", "two"}


# ---------------------------------------------------------------------------
# N-Quads (r08): 4-term lines, graph column, quad tolerance at the
# file-format level (reference adapter drops 4th elements, src:54-58)
# ---------------------------------------------------------------------------


def test_nquads_roundtrip_with_default_graph(spark):
    from matcha_spark.sources.ntriples import nqlines_to_quads, quads_to_nqlines
    from matcha_spark.terms import TERM_TYPE

    db = _mk_db(spark)
    # alternate rows into a named graph; leave the rest default-graph
    quads = db.withColumn(
        "g",
        F.when(
            F.xxhash64("s") % 2 == 0,
            F.struct(
                F.lit("uri").alias("kind"),
                F.lit("urn:g1").alias("lex"),
                F.lit(0.0).alias("num"),
                F.lit("").alias("lang"),
                F.lit("").alias("dt"),
            ).cast(TERM_TYPE),
        ),
    )
    back = nqlines_to_quads(quads_to_nqlines(quads))

    def key(r):
        g = r.g["lex"] if r.g is not None else None
        return (repr(from_term(r.s)), repr(from_term(r.p)), repr(from_term(r.o)), g)

    assert {key(r) for r in back.collect()} == {key(r) for r in quads.collect()}
    # default-graph rows rendered as plain triple lines (no 4th term)
    n_default = quads.where(F.col("g").isNull()).count()
    plain = quads_to_nqlines(quads).where(
        ~F.col("value").rlike(r"<urn:g1>\s*\.\s*$")
    )
    assert plain.count() == n_default


def test_read_nquads_quad_tolerance(spark, tmp_path):
    """drop_graph=True is the file-format analog of the reference's
    quad-tolerant row adapter: the graph column vanishes and the
    triples load/query identically."""
    from matcha_spark import TriplesDB, select
    from matcha_spark.sources.ntriples import read_nquads, write_nquads
    from matcha_spark.terms import TERM_TYPE

    db = _mk_db(spark)
    quads = db.withColumn(
        "g",
        F.struct(
            F.lit("uri").alias("kind"),
            F.lit("urn:gX").alias("lex"),
            F.lit(0.0).alias("num"),
            F.lit("").alias("lang"),
            F.lit("").alias("dt"),
        ).cast(TERM_TYPE),
    )
    path = str(tmp_path / "graph.nq")
    write_nquads(quads, path)
    dropped = read_nquads(spark, path)  # drop_graph default
    assert dropped.columns == ["s", "p", "o"]
    assert _decoded_set(dropped) == _decoded_set(db)
    kept = read_nquads(spark, path, drop_graph=False)
    assert kept.columns == ["s", "p", "o", "g"]
    assert kept.where(F.col("g").isNull()).count() == 0
    # and the dropped form feeds the query engine directly
    tdb = TriplesDB.from_df(dropped, cache=False)
    got = select(["?o"], [(URI("urn:s0"), kw(":p"), "?o")], tdb)
    assert got is not None


def test_ntriples_file_is_valid_nquads(spark):
    """Every N-Triples line parses as an N-Quads default-graph line."""
    from matcha_spark.sources.ntriples import nqlines_to_quads, triples_to_ntlines

    db = _mk_db(spark)
    quads = nqlines_to_quads(triples_to_ntlines(db))
    assert quads.where(F.col("g").isNotNull()).count() == 0
    assert {
        (repr(from_term(r.s)), repr(from_term(r.p)), repr(from_term(r.o)))
        for r in quads.collect()
    } == _decoded_set(db)


def test_nqlines_malformed_audit(spark):
    from matcha_spark.sources.ntriples import nqlines_malformed, nqlines_to_quads

    lines = spark.createDataFrame(
        [
            ("<urn:a> <urn:p> <urn:b> <urn:g> .",),  # quad: ok
            ("<urn:a> <urn:p> <urn:b> .",),  # triple: ok
            ("# comment",),
            ("",),
            ("<urn:a> <urn:p> .",),  # too few terms
            ("<urn:a> <urn:p> <urn:b> <urn:g> <urn:x> .",),  # too many
            ("<urn:a> <urn:p> <urn:b> <urn:g>",),  # missing dot
            # regression (r09 advice): the W3C grammar restricts graph
            # labels to IRIs/bnodes — a literal there is MALFORMED
            ('<urn:a> <urn:p> <urn:b> "g" .',),
            ("<urn:a> <urn:p> <urn:b> _:g .",),  # bnode graph: ok
        ],
        "value string",
    )
    assert nqlines_to_quads(lines).count() == 3
    bad = [r.value for r in nqlines_malformed(lines).collect()]
    assert sorted(bad) == sorted(
        [
            "<urn:a> <urn:p> .",
            "<urn:a> <urn:p> <urn:b> <urn:g> <urn:x> .",
            "<urn:a> <urn:p> <urn:b> <urn:g>",
            '<urn:a> <urn:p> <urn:b> "g" .',
        ]
    )


def test_fuzz_roundtrip_nasty_strings(spark):
    """Seeded fuzz: 200 adversarial strings (escape chars, quote/
    backslash runs, control chars, reserved-prefix collisions, fake
    lang-tag/datatype suffixes, unicode) round-trip losslessly through
    render→parse in every triple position."""
    import random

    from matcha_spark.sources.ntriples import ntlines_to_triples, triples_to_ntlines

    rng = random.Random(1234)
    atoms = [
        '"', "\\", "\n", "\r", "\t", "\x01", "\x7f", " ", ".",
        "<", ">", "@", "^^", "_:", "#", "é", "∀", "𝄞", "\\n", '\\"',
        "urn:matcha:", "urn:matcha:str:", "x", "'", "%", "%41",
        '"@en', '"^^<urn:x>', "\\\\", "a b", "",
    ]
    values = ["".join(rng.choice(atoms) for _ in range(rng.randint(0, 8)))
              for _ in range(200)]
    triples = []
    for i, v in enumerate(values):
        triples.append((to_term(URI(f"urn:f{i}")), to_term(kw(":p")), to_term(v)))
        triples.append((to_term(v), to_term(kw(":q")), to_term(i)))
    db = spark.createDataFrame(triples, TRIPLE_SCHEMA)
    back = ntlines_to_triples(triples_to_ntlines(db))
    assert _decoded_set(back) == _decoded_set(db)
    # and every rendered line is grammatical (no malformed fallout)
    from matcha_spark.sources.ntriples import ntlines_malformed

    assert ntlines_malformed(triples_to_ntlines(db)).count() == 0
