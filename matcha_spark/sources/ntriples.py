"""N-Triples source/sink for TERM-struct triple DataFrames.

The reference's typical workflow starts by pulling a graph serialized as
RDF (its README recommends fetching via SPARQL ``CONSTRUCT`` and then
querying locally — ``README.md:18-21``); this module gives the engine a
standard on-disk interchange format for the same graphs: one triple per
line, ``<s> <p> <o> .`` (W3C N-Triples).

Scale design
------------
Both directions are pure *narrow maps* built from JVM expressions
(``concat`` / ``regexp_extract`` / ``replace`` chains — whole-stage
codegen, no Python, no shuffle):

- **sink**: term → string rendering per column, one output line per
  triple; ``df.write.text`` scales with the writer parallelism.
- **source**: ``spark.read.text`` splits a 100 TB dump by line ranges
  across executors for free; each line parses independently.

Encoding (lossless for every TERM kind the engine stores)
---------------------------------------------------------
N-Triples only allows IRIs in subject/predicate position and
IRIs/literals in object position, while matcha triples hold arbitrary
host values anywhere (``src/grafter/matcha/alpha.clj:54-58``).  Non-IRI
terms are therefore written as IRIs under a reserved ``urn:matcha:``
scheme in *any* position (with the lexical form percent-encoded), and as
plain RDF literals in object position where N-Triples permits:

====== ============================================ =======================
kind    subject / predicate                          object
====== ============================================ =======================
uri     ``<lex>`` [#collide]_                        ``<lex>``
bnode   ``_:label`` (subject) [#bn]_                 ``_:label``
kw      ``<urn:matcha:kw:ENC>``                      ``<urn:matcha:kw:ENC>``
null    ``<urn:matcha:null>``                        ``<urn:matcha:null>``
str     ``<urn:matcha:str:ENC>``                     ``"escaped"``
int     ``<urn:matcha:int:lex>``                     ``"lex"^^xsd:integer``
double  ``<urn:matcha:double:num>``                  ``"num"^^xsd:double``
bool    ``<urn:matcha:bool:lex>``                    ``"lex"^^xsd:boolean``
lang    ``<urn:matcha:lang:ENC:ENC(tag)>``           ``"escaped"@tag`` [#fb]_
typed   ``<urn:matcha:typed:ENC:ENC(dt)>``           ``"escaped"^^<dt>`` [#fb]_
date    ``<urn:matcha:date:lex>``                    ``"lex"^^xsd:date``
datetime ``<urn:matcha:datetime:ENC>``               ``"lex"^^xsd:dateTime``
====== ============================================ =======================

``ENC`` = ``url_encode`` (percent-encoding, JVM built-in); literal
strings use the N-Triples ECHAR escapes (``\\`` ``\"`` ``\n`` ``\r``
``\t``).  Parsing inverts the table exactly, reconstructing the ``num``
mirror field (int/double/bool/date from the lexical form — non-finite
int casts clamp to 0.0, mirroring ``to_term``'s overflow behavior) so
round-tripped graphs join identically to the originals.

.. [#collide] A genuine URI whose lex itself starts with the reserved
   ``urn:matcha:`` prefix is escaped as ``<urn:matcha:uri:ENC>`` so the
   encoding stays injective (no collision with the reserved scheme).
.. [#bn] Blank nodes render as ``_:label`` where N-Triples allows them
   (subject/object) and the label fits the safe grammar
   ``[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?``; otherwise (or in
   predicate position, which N-Triples forbids) they fall back to
   ``<urn:matcha:bnode:ENC>``.  The parser accepts ``_:label`` in any
   position.
.. [#fb] Rendered as a literal only when the tag/datatype fits the safe
   grammar (lang: ``[A-Za-z][A-Za-z0-9-]*``; datatype IRI: no ``>``,
   control characters, or whitespace); otherwise the term falls back to
   its ``urn:matcha:`` IRI form, so no input value can produce a
   malformed line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..terms import TERM_TYPE

__all__ = [
    "triples_to_ntlines",
    "ntlines_to_triples",
    "write_ntriples",
    "read_ntriples",
    "ntlines_malformed",
    "quads_to_nqlines",
    "nqlines_to_quads",
    "write_nquads",
    "read_nquads",
    "nqlines_malformed",
]

_XSD = "http://www.w3.org/2001/XMLSchema#"


def _esc_chain(c: Column) -> Column:
    """N-Triples ECHAR escaping for string literal bodies (literal
    ``replace``, not regex — backslash first, so later escapes never
    double-process)."""
    for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def _unesc_chain(c: Column) -> Column:
    """Single-pass-correct ECHAR unescape.

    A naive replace chain is sequence-unsafe: ``\\\\n`` (escaped
    backslash + 'n') contains the substring ``\\n`` and would wrongly
    become backslash-newline.  Splitting on the *doubled* backslash
    first isolates segments in which every remaining backslash is an
    ECHAR head, so the per-segment named-escape replaces are exact;
    re-joining with a single backslash restores the literal ones.
    """
    parts = F.split(c, r"\\\\")  # Java regex for two literal backslashes
    seg = lambda p: F.replace(  # noqa: E731
        F.replace(
            F.replace(
                F.replace(p, F.lit("\\n"), F.lit("\n")),
                F.lit("\\r"),
                F.lit("\r"),
            ),
            F.lit("\\t"),
            F.lit("\t"),
        ),
        F.lit('\\"'),
        F.lit('"'),
    )
    return F.array_join(F.transform(parts, seg), "\\")


def _enc(c: Column) -> Column:
    return F.url_encode(c)


def _dec(c: Column) -> Column:
    return F.url_decode(c)


# blank-node labels we emit as bare ``_:label`` (a conservative ASCII
# subset of the spec's BLANK_NODE_LABEL; anything else falls back to the
# urn:matcha:bnode IRI form so rendering can never produce a bad line)
_BNODE_SAFE_RX = r"^[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?$"
_LANG_SAFE_RX = r"^[A-Za-z][A-Za-z0-9-]*$"
# datatype IRIs renderable inside ``^^<...>``: no '>', whitespace, or
# control characters (which would break the term/line grammar)
_DT_UNSAFE_RX = r"[\x00-\x20>]"


def _render_iri(t: Column, allow_bnode: bool = False) -> Column:
    """Render a TERM struct as an IRI (or, for bnodes in positions where
    N-Triples permits them, as a bare ``_:label``) — the subject form."""
    k = t["kind"]
    lex, num, lang, dt = t["lex"], t["num"], t["lang"], t["dt"]
    body = (
        F.when(
            k == "uri",
            # escape genuine URIs that collide with the reserved scheme
            F.when(
                lex.startswith("urn:matcha:"),
                F.concat(F.lit("urn:matcha:uri:"), _enc(lex)),
            ).otherwise(lex),
        )
        .when(k == "bnode", F.concat(F.lit("urn:matcha:bnode:"), _enc(lex)))
        .when(k == "kw", F.concat(F.lit("urn:matcha:kw:"), _enc(lex)))
        .when(k == "null", F.lit("urn:matcha:null"))
        .when(k == "str", F.concat(F.lit("urn:matcha:str:"), _enc(lex)))
        .when(k == "int", F.concat(F.lit("urn:matcha:int:"), lex))
        .when(k == "double", F.concat(F.lit("urn:matcha:double:"), num.cast("string")))
        .when(k == "bool", F.concat(F.lit("urn:matcha:bool:"), lex))
        .when(k == "date", F.concat(F.lit("urn:matcha:date:"), lex))
        .when(k == "datetime", F.concat(F.lit("urn:matcha:datetime:"), _enc(lex)))
        .when(k == "unbound", F.concat(F.lit("urn:matcha:unbound:"), lex))
        .when(
            k == "lang",
            F.concat(F.lit("urn:matcha:lang:"), _enc(lex), F.lit(":"), _enc(lang)),
        )
        .when(
            k == "typed",
            F.concat(F.lit("urn:matcha:typed:"), _enc(lex), F.lit(":"), _enc(dt)),
        )
    )
    iri = F.concat(F.lit("<"), body, F.lit(">"))
    if not allow_bnode:
        return iri
    return F.when(
        (k == "bnode") & lex.rlike(_BNODE_SAFE_RX), F.concat(F.lit("_:"), lex)
    ).otherwise(iri)


def _render_obj(t: Column) -> Column:
    """Render a TERM struct in object position — literals where
    N-Triples allows them, IRIs elsewhere."""
    k = t["kind"]
    lex, num, lang, dt = t["lex"], t["num"], t["lang"], t["dt"]
    q = F.lit('"')
    return (
        F.when(k == "str", F.concat(q, _esc_chain(lex), q))
        .when(
            k == "int",
            F.concat(q, lex, q, F.lit(f"^^<{_XSD}integer>")),
        )
        .when(
            k == "double",
            F.concat(q, num.cast("string"), q, F.lit(f"^^<{_XSD}double>")),
        )
        .when(k == "bool", F.concat(q, lex, q, F.lit(f"^^<{_XSD}boolean>")))
        .when(k == "date", F.concat(q, lex, q, F.lit(f"^^<{_XSD}date>")))
        .when(k == "datetime", F.concat(q, lex, q, F.lit(f"^^<{_XSD}dateTime>")))
        .when(
            (k == "lang") & lang.rlike(_LANG_SAFE_RX),
            F.concat(q, _esc_chain(lex), q, F.lit("@"), lang),
        )
        .when(
            (k == "typed") & (dt != "") & ~dt.rlike(_DT_UNSAFE_RX),
            F.concat(q, _esc_chain(lex), q, F.lit("^^<"), dt, F.lit(">")),
        )
        # lang/typed with out-of-grammar tag/datatype fall through to the
        # urn:matcha: IRI form rather than emitting a malformed line
        .otherwise(_render_iri(t, allow_bnode=True))
    )


def triples_to_ntlines(db: DataFrame) -> DataFrame:
    """One N-Triples line per triple: ``value: string`` (ready for
    ``.write.text``).  Narrow map — no shuffle."""
    return db.select(
        F.concat_ws(
            " ",
            _render_iri(F.col("s"), allow_bnode=True),
            _render_iri(F.col("p")),  # N-Triples forbids bnode predicates
            _render_obj(F.col("o")),
            F.lit("."),
        ).alias("value")
    )


def write_ntriples(db: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize a triple DataFrame to an N-Triples directory of text
    part-files.  ``path`` must be on shared storage (HDFS/S3/NFS) on a
    real cluster — executors write their own partitions."""
    triples_to_ntlines(db).write.mode(mode).text(path)


# one N-Triples term: IRI | blank node | literal (with optional @lang /
# ^^<dt>); bnodes are accepted in every position (lenient — real-world
# Turtle-ish dumps put them anywhere), labels per the spec's ASCII core
_TERM_RX = (
    r'(?:<[^>]*>|_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?'
    r'|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)'
)
_LINE_RX = rf"^\s*({_TERM_RX})\s+({_TERM_RX})\s+({_TERM_RX})\s*\.\s*$"


def _parse_iri_body(body: Column) -> Column:
    """TERM struct from the inside of ``<...>`` (IRI or reserved
    ``urn:matcha:`` encoding)."""
    pref = "urn:matcha:"
    rest = F.substring(body, len(pref) + 1, 1 << 30)
    kind = F.regexp_extract(rest, r"^([a-z]+)", 1)
    tail = F.regexp_extract(rest, r"^[a-z]+:(.*)$", 1)
    # lang mirrors typed: both lex and tag are ENC'd (ENC never emits
    # ':', so the last-colon split is unambiguous)
    lang_lex = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 1))
    lang_tag = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 2))
    typed_lex = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 1))
    typed_dt = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 2))
    return (
        F.when(~body.startswith(pref), _term(F.lit("uri"), body))
        .when(kind == F.lit("null"), _term(F.lit("null"), F.lit("")))
        .when(kind == F.lit("uri"), _term(F.lit("uri"), _dec(tail)))
        .when(kind == F.lit("bnode"), _term(F.lit("bnode"), _dec(tail)))
        .when(kind == F.lit("kw"), _term(F.lit("kw"), _dec(tail)))
        .when(kind == F.lit("str"), _term(F.lit("str"), _dec(tail)))
        .when(kind == F.lit("int"), _term(F.lit("int"), tail, num=_finite(tail)))
        .when(
            kind == F.lit("double"),
            _term(F.lit("double"), F.lit(""), num=tail.cast("double")),
        )
        .when(
            kind == F.lit("bool"),
            _term(F.lit("bool"), tail, num=(tail == "true").cast("double")),
        )
        .when(
            kind == F.lit("date"),
            _term(
                F.lit("date"),
                tail,
                num=(F.datediff(tail.cast("date"), F.lit("0001-01-01").cast("date")) + 1).cast(
                    "double"
                ),
            ),
        )
        .when(kind == F.lit("datetime"), _datetime_term(_dec(tail)))
        .when(
            kind == F.lit("unbound"),
            _term(
                F.lit("unbound"),
                tail,
                num=F.regexp_extract(tail, r"^_(\d+)$", 1).cast("double"),
            ),
        )
        .when(kind == F.lit("lang"), _term(F.lit("lang"), lang_lex, lang=lang_tag))
        .when(kind == F.lit("typed"), _term(F.lit("typed"), typed_lex, dt=typed_dt))
        .otherwise(_term(F.lit("uri"), body))  # unknown urn:matcha:* → opaque IRI
    )


def _finite(c: Column) -> Column:
    """Cast a lexical form to double, clamping non-finite results (e.g.
    an integer beyond double range parsing to Infinity) to 0.0 — the
    exact mirror of ``to_term``'s OverflowError fallback, so huge-int
    terms stay struct-equal (and joinable) across a round-trip."""
    d = c.cast("double")
    return F.when(
        d.isNull() | F.isnan(d) | (F.abs(d) == F.lit(float("inf"))), F.lit(0.0)
    ).otherwise(d)


def _term(kind: Column, lex: Column, num: Column | None = None,
          lang: Column | None = None, dt: Column | None = None) -> Column:
    return F.struct(
        kind.alias("kind"),
        F.coalesce(lex, F.lit("")).alias("lex"),
        F.coalesce(num if num is not None else F.lit(0.0), F.lit(0.0))
        .cast("double")
        .alias("num"),
        F.coalesce(lang if lang is not None else F.lit(""), F.lit("")).alias("lang"),
        F.coalesce(dt if dt is not None else F.lit(""), F.lit("")).alias("dt"),
    )


def _datetime_term(lex: Column) -> Column:
    # num mirror = epoch seconds for tz-aware stamps (matches
    # ``to_term``: naive datetimes carry num 0.0).  ISO-8601 offsets
    # parse natively; micros preserved via unix_micros/1e6.
    aware = lex.rlike(r"(Z|[+-][0-9]{2}:[0-9]{2})$")
    num = F.when(aware, F.unix_micros(F.to_timestamp(lex)) / F.lit(1000000.0)).otherwise(
        F.lit(0.0)
    )
    return _term(F.lit("datetime"), lex, num=num)


def _parse_term(ts: Column) -> Column:
    """TERM struct from one rendered N-Triples term string."""
    is_iri = ts.startswith("<")
    iri_body = F.regexp_extract(ts, r"^<(.*)>$", 1)
    lit_body = _unesc_chain(F.regexp_extract(ts, r'^"((?:[^"\\]|\\.)*)"', 1))
    lang_tag = F.regexp_extract(ts, r'"@([A-Za-z][A-Za-z0-9-]*)$', 1)
    dt_iri = F.regexp_extract(ts, r"\^\^<([^>]*)>$", 1)
    plain_kind = (
        F.when(dt_iri == f"{_XSD}integer", F.lit("int"))
        .when(dt_iri == f"{_XSD}double", F.lit("double"))
        .when(dt_iri == f"{_XSD}boolean", F.lit("bool"))
        .when(dt_iri == f"{_XSD}date", F.lit("date"))
        .when(dt_iri == f"{_XSD}dateTime", F.lit("datetime"))
        .when(dt_iri == "", F.lit("str"))
        .otherwise(F.lit("typed"))
    )
    num = (
        F.when(plain_kind == "int", _finite(lit_body))
        .when(plain_kind == "double", lit_body.cast("double"))
        .when(plain_kind == "bool", (lit_body == "true").cast("double"))
        .when(
            plain_kind == "date",
            (F.datediff(lit_body.cast("date"), F.lit("0001-01-01").cast("date")) + 1).cast(
                "double"
            ),
        )
        .otherwise(F.lit(0.0))
    )
    literal = (
        F.when(lang_tag != "", _term(F.lit("lang"), lit_body, lang=lang_tag))
        .when(
            plain_kind == "typed",
            _term(F.lit("typed"), lit_body, dt=dt_iri),
        )
        .when(
            plain_kind == "double",
            _term(F.lit("double"), F.lit(""), num=num),
        )
        .when(plain_kind == "datetime", _datetime_term(lit_body))
        .otherwise(_term(plain_kind, lit_body, num=num))
    )
    return (
        F.when(is_iri, _parse_iri_body(iri_body))
        .when(
            ts.startswith("_:"),
            _term(F.lit("bnode"), F.substring(ts, 3, 1 << 30)),
        )
        .otherwise(literal)
        .cast(TERM_TYPE)
    )


def ntlines_to_triples(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse N-Triples lines into a ``(s, p, o)`` TERM-struct DataFrame.

    Blank and comment (``#``) lines are skipped; anything else that does
    not match the line grammar raises at action time would be silent —
    instead malformed lines are *dropped* here and countable by the
    caller via ``lines.subtract``-style audits (documented contract:
    N-Triples dumps are machine-written).  Narrow map, no shuffle.
    """
    c = F.col(col)
    parsed = (
        lines.where(~F.trim(c).rlike(r"^(#.*)?$"))
        .select(
            F.regexp_extract(c, _LINE_RX, 1).alias("ts"),
            F.regexp_extract(c, _LINE_RX, 2).alias("tp"),
            F.regexp_extract(c, _LINE_RX, 3).alias("to"),
        )
        .where((F.col("ts") != "") & (F.col("tp") != "") & (F.col("to") != ""))
    )
    return parsed.select(
        _parse_term(F.col("ts")).alias("s"),
        _parse_term(F.col("tp")).alias("p"),
        _parse_term(F.col("to")).alias("o"),
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Load an N-Triples file/directory as a TERM-struct triple
    DataFrame.  ``spark.read.text`` gives line-level input splits, so a
    100 TB dump parses fully in parallel."""
    return ntlines_to_triples(spark.read.text(path))


def ntlines_malformed(lines: DataFrame, col: str = "value") -> DataFrame:
    """The audit complement of :func:`ntlines_to_triples`: lines that
    are neither blank/comment nor parseable triples.  Run it (cheaply,
    same narrow-map shape) alongside an ingest to count/inspect what
    was dropped — silent truncation at 100 TB reads as "ingested
    everything" when it didn't."""
    c = F.col(col)
    return lines.where(
        ~F.trim(c).rlike(r"^(#.*)?$") & ~c.rlike(_LINE_RX)
    )


# ---------------------------------------------------------------------------
# N-Quads (W3C): the 4-term line format.  The reference's row adapter is
# QUAD-tolerant — a 4-element tuple is accepted and its 4th (graph)
# element dropped (``src/grafter/matcha/alpha.clj:54-58``); these
# functions extend that tolerance to the on-disk interchange level:
# parse keeps the graph label as a nullable ``g`` TERM column (null =
# default graph, i.e. a plain triple line — every N-Triples file is a
# valid N-Quads file), and ``read_nquads(drop_graph=True)`` is the
# file-format analog of the adapter's quad drop.  Same narrow-map,
# no-shuffle shape as the triple functions.
# ---------------------------------------------------------------------------

# graph labels are IRIs / blank nodes ONLY (W3C N-Quads grammar:
# graphLabel ::= IRIREF | BLANK_NODE_LABEL) — a literal in the 4th
# position must fall through to nqlines_malformed, not parse
_GRAPH_RX = (
    r'(?:<[^>]*>|_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)'
)
_QLINE_RX = (
    rf"^\s*({_TERM_RX})\s+({_TERM_RX})\s+({_TERM_RX})"
    rf"(?:\s+({_GRAPH_RX}))?\s*\.\s*$"
)


def quads_to_nqlines(db: DataFrame) -> DataFrame:
    """One N-Quads line per row of an ``(s, p, o, g)`` DataFrame —
    rows with a null ``g`` render as plain triple lines (default
    graph), matching the spec.  Narrow map, ready for ``.write.text``."""
    return db.select(
        F.concat_ws(
            " ",
            _render_iri(F.col("s"), allow_bnode=True),
            _render_iri(F.col("p")),
            _render_obj(F.col("o")),
            F.when(
                F.col("g").isNotNull(),
                _render_iri(F.col("g"), allow_bnode=True),
            ),
            F.lit("."),
        ).alias("value")
    )


def nqlines_to_quads(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse N-Quads lines into ``(s, p, o, g)`` TERM structs, ``g``
    null for triple (default-graph) lines.  Blank/comment lines are
    skipped, malformed lines dropped (audit via
    :func:`nqlines_malformed`)."""
    c = F.col(col)
    parsed = (
        lines.where(~F.trim(c).rlike(r"^(#.*)?$"))
        .select(
            F.regexp_extract(c, _QLINE_RX, 1).alias("ts"),
            F.regexp_extract(c, _QLINE_RX, 2).alias("tp"),
            F.regexp_extract(c, _QLINE_RX, 3).alias("to"),
            F.regexp_extract(c, _QLINE_RX, 4).alias("tg"),
        )
        .where((F.col("ts") != "") & (F.col("tp") != "") & (F.col("to") != ""))
    )
    return parsed.select(
        _parse_term(F.col("ts")).alias("s"),
        _parse_term(F.col("tp")).alias("p"),
        _parse_term(F.col("to")).alias("o"),
        F.when(F.col("tg") != "", _parse_term(F.col("tg"))).alias("g"),
    )


def write_nquads(db: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize an ``(s, p, o, g)`` DataFrame to N-Quads text
    part-files (shared storage on a real cluster)."""
    quads_to_nqlines(db).write.mode(mode).text(path)


def read_nquads(spark: SparkSession, path: str, drop_graph: bool = True) -> DataFrame:
    """Load an N-Quads file/directory.  With ``drop_graph`` (default)
    the graph column is discarded — the file-format analog of the
    reference adapter's quad tolerance (``src:54-58``) — yielding a
    TriplesDB-ready ``(s, p, o)`` DataFrame; pass ``drop_graph=False``
    to keep ``g`` for named-graph-aware processing."""
    quads = nqlines_to_quads(spark.read.text(path))
    return quads.select("s", "p", "o") if drop_graph else quads


def nqlines_malformed(lines: DataFrame, col: str = "value") -> DataFrame:
    """Audit complement of :func:`nqlines_to_quads` — non-blank,
    non-comment lines the quad grammar rejects."""
    c = F.col(col)
    return lines.where(
        ~F.trim(c).rlike(r"^(#.*)?$") & ~c.rlike(_QLINE_RX)
    )
