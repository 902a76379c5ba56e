"""Heterogeneous term encoding for the triples engine.

The reference (Swirrl/matcha) stores *any* host value in any triple
position and compares by Clojure value equality — ``:rick`` (keyword),
``"rick"`` (string) and ``URI("rick")`` are all distinct, and ``nil`` is a
matchable value, not an absence (reference ``test/grafter/matcha/
alpha_test.clj:133-138``; spec ``src/grafter/matcha/alpha.clj:142-146``).

Spark columns are homogeneously typed and SQL ``NULL`` never equi-joins,
so each triple position is a tagged struct::

    TERM = struct<kind: string, lex: string, num: double,
                  lang: string, dt: string>

Unused fields hold *empty-string / 0.0 defaults rather than NULL* so that
plain field-wise struct equality — which is what Spark equi-joins use —
implements host-value equality exactly, with no null-semantics corner
cases inside the join keys.  ``kind='null'`` makes nil a joinable value.

Kinds: ``uri kw str int double bool null lang typed date datetime
bnode unbound``.  ``unbound`` never appears in a database; it is
produced by the query layer for SPARQL-OPTIONAL unbound markers
(``_0``, ``_1`` …, reference ``src:382-395``).  ``bnode`` is an RDF
blank node (label-identified, scoped to the graph it was read from) —
real-world dumps the reference's fetch-then-query workflow ingests
contain them, so they are first-class joinable terms here.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

__all__ = [
    "TERM_TYPE",
    "TRIPLE_SCHEMA",
    "Keyword",
    "URI",
    "BNode",
    "LangString",
    "RDFLiteral",
    "Unbound",
    "kw",
    "to_term",
    "from_term",
    "term_lit",
    "register_term_codec",
    "unregister_term_codec",
]

TERM_TYPE = StructType(
    [
        StructField("kind", StringType(), nullable=False),
        StructField("lex", StringType(), nullable=False),
        StructField("num", DoubleType(), nullable=False),
        StructField("lang", StringType(), nullable=False),
        StructField("dt", StringType(), nullable=False),
    ]
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("s", TERM_TYPE, nullable=False),
        StructField("p", TERM_TYPE, nullable=False),
        StructField("o", TERM_TYPE, nullable=False),
    ]
)


@dataclass(frozen=True)
class Keyword:
    """Analog of a Clojure keyword ``:ns/name`` (reference test fixtures
    use keywords pervasively, e.g. ``test:38-45``)."""

    ns: str | None
    name: str

    def __str__(self) -> str:  # ":ns/name" | ":name"
        return f":{self.ns}/{self.name}" if self.ns else f":{self.name}"

    def __repr__(self) -> str:
        return str(self)


def kw(s: str) -> Keyword:
    """``kw(":foaf/knows")`` / ``kw("foaf/knows")`` / ``kw(":label")``."""
    s = s[1:] if s.startswith(":") else s
    if "/" in s:
        ns, _, name = s.partition("/")
        return Keyword(ns, name)
    return Keyword(None, s)


@dataclass(frozen=True)
class URI:
    """An IRI term (reference uses ``java.net.URI``, ``test:21-26``)."""

    value: str

    def __str__(self) -> str:
        return self.value

    def __repr__(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BNode:
    """RDF blank node, identified by label.  Labels are only meaningful
    within one graph/dump — two dumps both naming ``_:b0`` denote
    unrelated nodes — so cross-graph joins on bnodes are the caller's
    responsibility (standard RDF semantics)."""

    label: str

    def __str__(self) -> str:
        return f"_:{self.label}"

    def __repr__(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class LangString:
    """RDF language-tagged literal (reference ``src:32-39``)."""

    text: str
    lang: str


@dataclass(frozen=True)
class RDFLiteral:
    """RDF datatyped literal (reference ``src:41-48``)."""

    lex: str
    datatype: str


@dataclass(frozen=True)
class Unbound:
    """Unbound-optional marker, surfaces as ``_N`` (reference
    ``src:382-395``; expected literally in ``test:536``, ``test:746-750``).
    Marker *numbers* depend on evaluation order in the reference; compare
    up to renaming."""

    n: int

    def __str__(self) -> str:
        return f"_{self.n}"

    def __repr__(self) -> str:
        return f"_{self.n}"


_EMPTY = ("", 0.0, "", "")  # lex-tail defaults: num, lang, dt

# pluggable codecs for arbitrary host types (the reference accepts any
# host value as a term, e.g. Grafter's OffsetDate record, ``src:54-58``,
# ``test:234-249``): type → (name, encode), name → (type, decode).
_CODEC_BY_TYPE: dict[type, tuple[str, Any]] = {}
_CODEC_BY_NAME: dict[str, Any] = {}
_CODEC_DT_PREFIX = "python:"


def register_term_codec(cls: type, name: str, encode, decode) -> None:
    """Register a codec so instances of ``cls`` can be used as terms.

    ``encode(value) → str`` must be *injective* (equal values ↔ equal
    strings): term equality, joins, and dedup all compare the encoded
    struct.  ``decode(lex) → value`` inverts it.  Encoded terms are
    ``kind='typed'`` with datatype ``python:<name>``, so they survive
    save/load and compare distinctly from every built-in kind."""
    if not isinstance(name, str) or not name:
        raise ValueError("codec name must be a non-empty string")
    _CODEC_BY_TYPE[cls] = (name, encode)
    _CODEC_BY_NAME[name] = decode


def unregister_term_codec(cls: type) -> None:
    entry = _CODEC_BY_TYPE.pop(cls, None)
    if entry:
        _CODEC_BY_NAME.pop(entry[0], None)


def to_term(value: Any) -> tuple[str, str, float, str, str]:
    """Encode a Python value to a TERM struct tuple.

    Covers every host type exercised by the reference test suite
    (``test:21-45``, ``test:133-138``, ``test:234-249``, ``test:691-694``).
    Collections are rejected by the pattern validator before reaching here.
    """
    if value is None:
        return ("null", "", 0.0, "", "")
    if isinstance(value, bool):  # before int: bool is an int subclass
        return ("bool", "true" if value else "false", 1.0 if value else 0.0, "", "")
    if isinstance(value, int):
        try:
            num = float(value)
        except OverflowError:
            num = 0.0
        return ("int", str(value), num, "", "")
    if isinstance(value, float):
        # lex deliberately empty: Python repr and Java Double.toString
        # disagree on shortest float rendering (1e+20 vs 1.0E20, subnormal
        # digit choice), so equality lives in the num field — native
        # double comparison joins identically from either side
        return ("double", "", value, "", "")
    if isinstance(value, str):
        return ("str", value, 0.0, "", "")
    if isinstance(value, Keyword):
        return ("kw", str(value)[1:], 0.0, "", "")
    if isinstance(value, URI):
        return ("uri", value.value, 0.0, "", "")
    if isinstance(value, BNode):
        return ("bnode", value.label, 0.0, "", "")
    if isinstance(value, LangString):
        return ("lang", value.text, 0.0, value.lang, "")
    if isinstance(value, RDFLiteral):
        return ("typed", value.lex, 0.0, "", value.datatype)
    if isinstance(value, _dt.datetime):  # before date: datetime is a date
        return ("datetime", value.isoformat(), value.timestamp() if value.tzinfo else 0.0, "", "")
    if isinstance(value, _dt.date):
        return ("date", value.isoformat(), float(value.toordinal()), "", "")
    if isinstance(value, Unbound):
        return ("unbound", str(value), float(value.n), "", "")
    for cls, (name, encode) in _CODEC_BY_TYPE.items():
        if isinstance(value, cls):
            return ("typed", encode(value), 0.0, "", _CODEC_DT_PREFIX + name)
    raise TypeError(
        f"cannot encode {type(value).__name__} as a triple term: {value!r} "
        "(register_term_codec adds support for custom host types)"
    )


def from_term(row: Any) -> Any:
    """Decode a TERM struct Row (or tuple) back to a Python value."""
    if row is None:
        return None
    kind, lex = row[0], row[1]
    if kind == "null":
        return None
    if kind == "str":
        return lex
    if kind == "kw":
        return kw(lex)
    if kind == "uri":
        return URI(lex)
    if kind == "bnode":
        return BNode(lex)
    if kind == "int":
        return int(lex)
    if kind == "double":
        # NULL num = an arithmetic error-as-absence result (t_add over a
        # non-numeric term, t_div by zero — termfns convention): decode
        # to None like nil instead of crashing float(None) (r14, found
        # by the Bind fuzzer the round after the Filter fuzzer caught
        # the ANSI lex_as abort — same bug class, decode side)
        return float(row[2]) if row[2] is not None else None
    if kind == "bool":
        return lex == "true"
    if kind == "lang":
        return LangString(lex, row[3])
    if kind == "typed":
        dt = row[4]
        if dt.startswith(_CODEC_DT_PREFIX):
            decode = _CODEC_BY_NAME.get(dt[len(_CODEC_DT_PREFIX):])
            if decode is not None:
                return decode(lex)
        return RDFLiteral(lex, dt)
    if kind == "datetime":
        return _dt.datetime.fromisoformat(lex)
    if kind == "date":
        return _dt.date.fromisoformat(lex)
    if kind == "unbound":
        return Unbound(int(lex[1:]))
    raise ValueError(f"unknown term kind: {kind!r}")


def term_lit(value: Any):
    """A Spark literal Column holding the TERM struct for ``value``.

    Used to inject pattern constants into filters — the resulting
    ``col == term_lit(v)`` comparison is a plain struct equality that
    Catalyst folds and pushes down to the scan.
    """
    k, lex, num, lang, dt = to_term(value)
    return F.struct(
        F.lit(k).alias("kind"),
        F.lit(lex).alias("lex"),
        F.lit(num).alias("num"),
        F.lit(lang).alias("lang"),
        F.lit(dt).alias("dt"),
    )


def sort_key(value: Any) -> tuple:
    """Deterministic cross-type ordering for canonical result sorting."""
    t = to_term(value)
    return (t[0], t[1], t[2], t[3], t[4])
