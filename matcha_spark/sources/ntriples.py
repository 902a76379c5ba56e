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
# Turtle-ish dumps put them anywhere), labels per the spec's ASCII core.
# The closed repetitions use POSSESSIVE quantifiers (r18, guide §1/§2:
# the parse regex runs once per line over lines that can carry whole
# documents): `[^>]*+` and the string-body loop can never legitimately
# give characters back (the closing delimiter is excluded from the
# repeated class), so possessive matching is exactly equivalent while
# removing the backtracking state Java's engine would otherwise keep
# per character of a multi-KB literal.  The bnode label's inner
# repetition is deliberately NOT possessive — its trailing character
# class overlaps the repeated one, so it genuinely needs to give one
# character back.
_TERM_RX = (
    r'(?:<[^>]*+>|_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?'
    r'|"(?:[^"\\]|\\.)*+"(?:@[A-Za-z][A-Za-z0-9-]*+|\^\^<[^>]*+>)?)'
)
_LINE_RX = rf"^\s*({_TERM_RX})\s+({_TERM_RX})\s+({_TERM_RX})\s*\.\s*$"


# the reserved-scheme kinds _parse_iri_body recognises; anything else
# under urn:matcha:* parses as an opaque URI (unchanged contract)
_IRI_KINDS = (
    "null", "uri", "bnode", "kw", "str", "int", "double", "bool",
    "date", "datetime", "unbound", "lang", "typed",
)


def _iri_fields(body: Column) -> tuple[Column, Column, Column, Column, Column]:
    """(kind, lex, num, lang, dt) for the inside of ``<...>`` — the
    per-FIELD decomposition of the old case-of-structs chain (r18,
    guide §1.2 "per-task work"): building one struct whose five fields
    are each a small CASE is semantically identical to a 14-branch
    CASE of five-field structs, but shrinks the generated code ~5× —
    the old form compiled past the JIT method limit and the whole
    parse stage ran interpreted."""
    pref = "urn:matcha:"
    rest = F.substring(body, len(pref) + 1, 1 << 30)
    kind = F.regexp_extract(rest, r"^([a-z]+)", 1)
    tail = F.regexp_extract(rest, r"^[a-z]+:(.*)$", 1)
    # lang mirrors typed: both lex and tag are ENC'd (ENC never emits
    # ':', so the last-colon split is unambiguous)
    pair_lex = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 1))
    pair_tag = _dec(F.regexp_extract(tail, r"^(.*):([^:]*)$", 2))
    reserved = body.startswith(pref) & kind.isin(*_IRI_KINDS)
    k = F.when(reserved, kind).otherwise(F.lit("uri"))
    lex = (
        F.when(~reserved, body)  # genuine / unknown-scheme URI
        .when(kind == "null", F.lit(""))
        .when(kind.isin("uri", "bnode", "kw", "str", "datetime"), _dec(tail))
        .when(kind == "double", F.lit(""))
        .when(kind.isin("lang", "typed"), pair_lex)
        .otherwise(tail)  # int / bool / date / unbound: raw lexical form
    )
    aware_dt = _dec(tail)
    num = (
        F.when(~reserved, F.lit(0.0))
        .when(kind == "int", _finite(tail))
        .when(kind == "double", tail.cast("double"))
        .when(kind == "bool", (tail == "true").cast("double"))
        .when(
            kind == "date",
            (
                F.datediff(tail.cast("date"), F.lit("0001-01-01").cast("date"))
                + 1
            ).cast("double"),
        )
        .when(kind == "datetime", _datetime_num(aware_dt))
        .when(
            kind == "unbound",
            F.regexp_extract(tail, r"^_(\d+)$", 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    lang = F.when(reserved & (kind == "lang"), pair_tag).otherwise(F.lit(""))
    dt = F.when(reserved & (kind == "typed"), pair_tag).otherwise(F.lit(""))
    return k, lex, num, lang, dt


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


def _datetime_num(lex: Column) -> Column:
    # num mirror = epoch seconds for tz-aware stamps (matches
    # ``to_term``: naive datetimes carry num 0.0).  ISO-8601 offsets
    # parse natively; micros preserved via unix_micros/1e6.
    aware = lex.rlike(r"(Z|[+-][0-9]{2}:[0-9]{2})$")
    return F.when(
        aware, F.unix_micros(F.to_timestamp(lex)) / F.lit(1000000.0)
    ).otherwise(F.lit(0.0))


def _parse_term(ts: Column) -> Column:
    """TERM struct from one rendered N-Triples term string.

    Built field-by-field (five small CASE chains feeding ONE struct)
    rather than as a CASE over fully-built structs — same result, ~5×
    less generated code, which keeps the whole parse projection inside
    whole-stage codegen's JIT-compilable method size (r18; the old
    shape made this the slowest expression in the suite)."""
    is_iri = ts.startswith("<")
    is_bn = ts.startswith("_:")
    iri_body = F.regexp_extract(ts, r"^<(.*)>$", 1)
    lit_body = _unesc_chain(F.regexp_extract(ts, r'^"((?:[^"\\]|\\.)*+)"', 1))
    lang_tag = F.regexp_extract(ts, r'"@([A-Za-z][A-Za-z0-9-]*+)$', 1)
    dt_iri = F.regexp_extract(ts, r"\^\^<([^>]*+)>$", 1)
    plain_kind = (
        F.when(dt_iri == f"{_XSD}integer", F.lit("int"))
        .when(dt_iri == f"{_XSD}double", F.lit("double"))
        .when(dt_iri == f"{_XSD}boolean", F.lit("bool"))
        .when(dt_iri == f"{_XSD}date", F.lit("date"))
        .when(dt_iri == f"{_XSD}dateTime", F.lit("datetime"))
        .when(dt_iri == "", F.lit("str"))
        .otherwise(F.lit("typed"))
    )
    lit_num = (
        F.when(plain_kind == "int", _finite(lit_body))
        .when(plain_kind == "double", lit_body.cast("double"))
        .when(plain_kind == "bool", (lit_body == "true").cast("double"))
        .when(
            plain_kind == "date",
            (F.datediff(lit_body.cast("date"), F.lit("0001-01-01").cast("date")) + 1).cast(
                "double"
            ),
        )
        .when(plain_kind == "datetime", _datetime_num(lit_body))
        .otherwise(F.lit(0.0))
    )
    ik, ilex, inum, ilang, idt = _iri_fields(iri_body)
    # the coalesce never fires for a non-null input (every branch ends
    # in a literal; a NULL line falls through to plain_kind's "typed"
    # exactly as the old chain did) — it exists to keep the field's
    # TYPE non-nullable so the TERM_TYPE cast stays legal on nullable
    # text columns
    kind = F.coalesce(
        F.when(is_iri, ik)
        .when(is_bn, F.lit("bnode"))
        .when(lang_tag != "", F.lit("lang"))
        .otherwise(plain_kind),
        F.lit("typed"),
    )
    lex = (
        F.when(is_iri, ilex)
        .when(is_bn, F.substring(ts, 3, 1 << 30))
        .when((lang_tag == "") & (plain_kind == "double"), F.lit(""))
        .otherwise(lit_body)
    )
    num = (
        F.when(is_iri, inum)
        .when(is_bn | (lang_tag != ""), F.lit(0.0))
        .otherwise(lit_num)
    )
    lang = (
        F.when(is_iri, ilang)
        .when(is_bn, F.lit(""))
        .otherwise(lang_tag)
    )
    dt = (
        F.when(is_iri, idt)
        .when(is_bn | (lang_tag != ""), F.lit(""))
        .when(plain_kind == "typed", dt_iri)
        .otherwise(F.lit(""))
    )
    return _term(kind, lex, num=num, lang=lang, dt=dt).cast(TERM_TYPE)


def ntlines_to_triples(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse N-Triples lines into a ``(s, p, o)`` TERM-struct DataFrame.

    Blank and comment (``#``) lines are skipped; anything else that does
    not match the line grammar raises at action time would be silent —
    instead malformed lines are *dropped* here and countable by the
    caller via ``lines.subtract``-style audits (documented contract:
    N-Triples dumps are machine-written).  Narrow map, no shuffle.
    """
    c = F.col(col)
    # ONE anchored full-match rlike is exactly the old two-step filter
    # (blank/comment lines never match the line grammar, and a grammar
    # match guarantees all three groups non-empty — every TERM
    # alternative is ≥ 2 chars), but it references only the raw column:
    # the old extract-based filter predicates were pushed below the
    # projection and re-evaluated the full line regex (and, for
    # composed render→parse pipelines, the entire rendering expression)
    # three extra times per row (r18, guide §2.4/§7.2 — observed in
    # doc_nt_roundtrip's plan as a Filter node carrying four inlined
    # copies of the render CASE chain).
    parsed = lines.where(c.rlike(_LINE_RX)).select(
        F.regexp_extract(c, _LINE_RX, 1).alias("ts"),
        F.regexp_extract(c, _LINE_RX, 2).alias("tp"),
        F.regexp_extract(c, _LINE_RX, 3).alias("to"),
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
    # single anchored rlike filter for the same reason as
    # ntlines_to_triples (r18): equivalent to the old blank/comment +
    # non-empty-extract pair, without re-evaluating the line grammar
    # (or an upstream rendering projection) inside pushed-down
    # predicates
    parsed = lines.where(c.rlike(_QLINE_RX)).select(
        F.regexp_extract(c, _QLINE_RX, 1).alias("ts"),
        F.regexp_extract(c, _QLINE_RX, 2).alias("tp"),
        F.regexp_extract(c, _QLINE_RX, 3).alias("to"),
        F.regexp_extract(c, _QLINE_RX, 4).alias("tg"),
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
