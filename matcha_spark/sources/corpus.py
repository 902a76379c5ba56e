"""Raw-corpus ingestion sources — JSONL, CSV/TSV, whole-file text,
and their streaming variants.

Every suite entry reads pre-built parquet, but real corpora arrive as
JSONL (the lingua franca of pretraining data: one ``{"text": ...}``
object per line) or as directories of plain-text files.  These sources
land either shape in the ``documents``-table schema the operator
families consume (``doc_id``, ``text``, ``source``, + caller extras),
with malformed input QUARANTINED distributively instead of failing the
job or being silently dropped.

Scale design: the JSONL reader deliberately does NOT use
``spark.read.json``'s corrupt-record column — filtering on that
internal column is disallowed over raw file scans unless the whole
frame is cached first (a non-starter at corpus scale).  Instead the
file is scanned as TEXT LINES (splittable, pruned to one string
column) and parsed with ``from_json`` carrying an explicit
corrupt-record slot in its schema: good rows and quarantine rows are
both narrow, stateless projections of the same line scan — no cache,
no driver traffic, and the parse inlines into whole-stage codegen.
The same projection runs unchanged on ``readStream`` (streaming
JSONL → the streaming dedup/admission family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_jsonl_documents",
    "jsonl_quarantine",
    "write_jsonl_documents",
    "read_text_documents",
    "stream_jsonl_documents",
    "read_csv_documents",
    "csv_quarantine",
    "csv_header_lines",
    "stream_csv_documents",
]

_CORRUPT = "__corrupt"


def _doc_schema_ddl(
    text_field: str,
    id_field: str | None,
    source_field: str | None,
    extra_fields: dict[str, str] | None,
) -> str:
    """DDL schema string for ``from_json``: the caller's fields plus the
    corrupt-record slot (malformed lines land there verbatim)."""
    seen = {text_field}
    parts = [f"`{text_field}` string"]
    for f_ in (id_field, source_field):
        if f_ and f_ not in seen:
            seen.add(f_)
            parts.append(f"`{f_}` string")
    for name, typ in (extra_fields or {}).items():
        if name not in seen:
            seen.add(name)
            parts.append(f"`{name}` {typ}")
    parts.append(f"`{_CORRUPT}` string")
    return ", ".join(parts)


def _parse_lines(
    lines: DataFrame,
    text_field: str,
    id_field: str | None,
    source_field: str | None,
    extra_fields: dict[str, str] | None,
) -> DataFrame:
    """(value, __file, __d) for every non-blank line — the shared scan
    projection under both the good-row and quarantine views."""
    ddl = _doc_schema_ddl(text_field, id_field, source_field, extra_fields)
    return lines.where(F.trim("value") != "").select(
        "value",
        F.input_file_name().alias("__file"),
        F.from_json(
            "value", ddl, {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("__d"),
    )


def _good_rows(
    parsed: DataFrame,
    text_field: str,
    id_field: str | None,
    source_field: str | None,
    extra_fields: dict[str, str] | None,
) -> DataFrame:
    ok = parsed.where(
        F.col(f"__d.{_CORRUPT}").isNull()
        & F.col(f"__d.{text_field}").isNotNull()
    )
    doc_id = (
        F.col(f"__d.{id_field}")
        if id_field
        # content-addressed fallback: identical records collapse to one
        # id (dedup-friendly); a record differing only in metadata gets
        # a distinct id because the WHOLE line is hashed
        else F.md5("value")
    )
    source = (
        F.col(f"__d.{source_field}")
        if source_field
        else F.element_at(F.split("__file", "/"), -1)
    )
    cols = [
        doc_id.alias("doc_id"),
        F.col(f"__d.{text_field}").alias("text"),
        source.alias("source"),
    ]
    for name in extra_fields or {}:
        if name not in (text_field, id_field, source_field):
            cols.append(F.col(f"__d.{name}").alias(name))
    return ok.select(*cols)


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    extra_fields: dict[str, str] | None = None,
) -> DataFrame:
    """JSONL corpus → ``(doc_id, text, source, *extras)`` documents.

    ``extra_fields`` maps extra JSON keys to Spark DDL types (e.g.
    ``{"lang": "string", "score": "double"}``) — kept as typed output
    columns.  Without ``id_field`` the id is ``md5`` of the raw line
    (deterministic, partition-invariant, content-addressed); without
    ``source_field`` the source is the input file's basename.
    Malformed lines and records missing ``text_field`` are EXCLUDED
    here — read them with :func:`jsonl_quarantine` (same arguments) to
    audit them; blank lines are ignored outright."""
    parsed = _parse_lines(
        spark.read.text(path), text_field, id_field, source_field, extra_fields
    )
    return _good_rows(parsed, text_field, id_field, source_field, extra_fields)


def jsonl_quarantine(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    extra_fields: dict[str, str] | None = None,
) -> DataFrame:
    """The lines :func:`read_jsonl_documents` rejected, with why:
    ``(file, line, reason)`` where reason ∈ {``malformed_json``,
    ``missing_text``} — a distributed audit trail, not an error
    path (bad lines never fail the read)."""
    parsed = _parse_lines(
        spark.read.text(path), text_field, id_field, source_field, extra_fields
    )
    return parsed.where(
        F.col(f"__d.{_CORRUPT}").isNotNull()
        | F.col(f"__d.{text_field}").isNull()
    ).select(
        F.col("__file").alias("file"),
        F.col("value").alias("line"),
        F.when(F.col(f"__d.{_CORRUPT}").isNotNull(), F.lit("malformed_json"))
        .otherwise(F.lit("missing_text"))
        .alias("reason"),
    )


def write_jsonl_documents(
    docs: DataFrame,
    path: str,
    mode: str = "error",
    line_cols: tuple[str, ...] | None = None,
    compression: str | None = None,
) -> None:
    """The sink inverse of :func:`read_jsonl_documents`: one JSON
    object per line (the interchange format curated corpora ship in),
    written distributed — each partition lands as one part file, so
    the writer scales exactly like the text writer it rides.

    ``line_cols`` selects/orders the emitted keys (default: every
    column); ``compression`` is any Spark text codec (``"gzip"`` gives
    the classic ``.jsonl.gz`` drop-directory shape — splittability is
    lost per file, which is why the READER prefers many modest files
    over one giant one).  Spark's ``to_json`` performs all JSON string
    escaping, so write → read round-trips every value exactly (pinned
    by ``test_jsonl_write_read_roundtrip``).  NULL fields are omitted
    from the line (JSON-idiomatic): a NULL ``text`` therefore
    round-trips as a ``missing_text`` quarantine line, mirroring the
    reader's contract rather than inventing a ``"text": null`` row the
    reader would reject anyway.

    Order note: line order within a part file follows partition order;
    for a deterministic GLOBAL order, shuffle first
    (``operators.text.corpus_shuffle``) and ``repartitionByRange`` on
    the position — same recipe as ``write_corpus_shards``."""
    cols = list(line_cols or docs.columns)
    out = docs.select(F.to_json(F.struct(*cols)).alias("value"))
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_text_documents(
    spark: SparkSession, path: str, wholetext: bool = True
) -> DataFrame:
    """Plain-text corpus → documents: one doc per FILE (``wholetext``,
    the usual shape for scraped/plain corpora) or one doc per LINE.
    ``doc_id``/``source`` are the file basename (per-file mode) or
    ``md5`` of the line (per-line mode, content-addressed like the
    JSONL fallback).  Note ``wholetext`` files are read unsplit — fine
    for document-sized files, not for one giant file (use line mode
    there)."""
    if wholetext:
        raw = spark.read.text(path, wholetext=True)
        base = F.element_at(F.split(F.input_file_name(), "/"), -1)
        return raw.select(
            base.alias("doc_id"),
            F.col("value").alias("text"),
            base.alias("source"),
        )
    raw = spark.read.text(path)
    return raw.where(F.trim("value") != "").select(
        F.md5("value").alias("doc_id"),
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
    )


def stream_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    extra_fields: dict[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl_documents` — the same parse
    projection over ``readStream.text``, so a JSONL drop-directory
    feeds the streaming dedup/admission family
    (``streaming/dedup.stream_incremental_dedup``) directly.  Bad
    lines are silently excluded here (a streaming quarantine would be
    its own sink; audit batches with :func:`jsonl_quarantine`)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    parsed = _parse_lines(
        reader.text(path), text_field, id_field, source_field, extra_fields
    )
    return _good_rows(parsed, text_field, id_field, source_field, extra_fields)


# ---------------------------------------------------------------------------
# CSV / TSV (r12) — same scan shape and quarantine contract as JSONL
# ---------------------------------------------------------------------------


def _csv_schema_ddl(fields: dict[str, str]) -> str:
    parts = [f"`{n}` {t}" for n, t in fields.items()]
    parts.append(f"`{_CORRUPT}` string")
    return ", ".join(parts)


def _csv_header_cond(fields: dict[str, str], sep: str, quote: str):
    """Predicate over ``value``: the line's trimmed, unquoted fields
    equal the declared field-name multiset (any order) — the stateless
    "is a header" test shared by the drop in :func:`_parse_csv_lines`
    and the audit view :func:`csv_header_lines`."""
    qq = re.escape(quote)
    norm = F.transform(
        F.split("value", re.escape(sep)),
        lambda p: F.regexp_replace(F.trim(p), f"^{qq}|{qq}$", ""),
    )
    names = F.array(*[F.lit(n) for n in fields])
    return F.array_sort(norm) == F.array_sort(names)


def _parse_csv_lines(
    lines: DataFrame,
    fields: dict[str, str],
    sep: str,
    header: bool,
    quote: str,
) -> DataFrame:
    """(value, __file, __d) for every non-blank data line — the CSV
    twin of ``_parse_lines``: the file is scanned as TEXT LINES
    (splittable, one pruned string column) and parsed with
    ``from_csv`` carrying the corrupt-record slot, so good rows and
    quarantine rows are narrow stateless projections of one scan.

    ``header=True`` drops lines that match the expected header — the
    line-based scan has no per-file "first line" notion, and matching
    the declared header is the stateless equivalent.  Matching (r12
    advice) is per-field: the line is split on ``sep`` and each field
    trimmed and stripped of surrounding quotes, so headers with extra
    spacing, per-field or partial quoting, or a different column ORDER
    (same name set) are all recognized and dropped instead of parsing
    into a bogus all-string document.  The flip side: a genuine data
    row whose normalized fields equal the header-name multiset is
    dropped too — from good rows AND from quarantine; the dropped
    lines are auditable via :func:`csv_header_lines` (r13 advice: the
    loss surface must be countable, not silent).  Records must be
    single-line: embedded newlines need
    ``spark.read.csv(multiLine=True)``, which gives up input splitting
    — the wrong trade at corpus scale."""
    ddl = _csv_schema_ddl(fields)
    out = lines.where(F.trim("value") != "")
    if header:
        out = out.where(~_csv_header_cond(fields, sep, quote))
    return out.select(
        "value",
        F.input_file_name().alias("__file"),
        F.from_csv(
            "value",
            ddl,
            {
                "sep": sep,
                "quote": quote,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": _CORRUPT,
            },
        ).alias("__d"),
    )


def read_csv_documents(
    spark: SparkSession,
    path: str,
    fields: dict[str, str] | None = None,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
) -> DataFrame:
    """CSV/TSV corpus → ``(doc_id, text, source, *extras)`` documents
    in the same shape every operator family consumes.

    ``fields`` is an ORDERED name→DDL-type mapping declaring the
    file's columns (CSV is positional; default ``{"text":
    "string"}``); ``text_field`` must be one of them.  Extra fields
    become typed output columns.  Id/source fallbacks match the JSONL
    reader: ``md5`` of the raw line / the file basename.  Malformed
    lines (parse failure or NULL text) are EXCLUDED here and reported
    by :func:`csv_quarantine`; ``sep="\\t"`` reads TSV.

    Header-elimination loss (r12 advice): with ``header=True``, any
    line whose trimmed, unquoted fields equal the declared field-name
    multiset is treated as a header and dropped — from the good rows
    and from :func:`csv_quarantine` alike.  A genuine data row whose
    content coincides with the header names is lost; audit the dropped
    lines with :func:`csv_header_lines` (r13 advice), and if the
    corpus can contain such rows, read with ``header=False`` and
    filter headers upstream."""
    fields = fields or {"text": "string"}
    if text_field not in fields:
        raise ValueError(
            f"text_field {text_field!r} is not in fields {list(fields)}"
        )
    parsed = _parse_csv_lines(spark.read.text(path), fields, sep, header, quote)
    extras = {n: t for n, t in fields.items()
              if n not in (text_field, id_field, source_field)}
    return _good_rows(parsed, text_field, id_field, source_field, extras)


def csv_quarantine(
    spark: SparkSession,
    path: str,
    fields: dict[str, str] | None = None,
    text_field: str = "text",
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
) -> DataFrame:
    """The lines :func:`read_csv_documents` rejected, with why:
    ``(file, line, reason)``, reason ∈ {``malformed_csv``,
    ``missing_text``} — the same distributed audit contract as
    :func:`jsonl_quarantine` and :func:`warc_malformed`."""
    fields = fields or {"text": "string"}
    parsed = _parse_csv_lines(spark.read.text(path), fields, sep, header, quote)
    return parsed.where(
        F.col(f"__d.{_CORRUPT}").isNotNull()
        | F.col(f"__d.{text_field}").isNull()
    ).select(
        F.col("__file").alias("file"),
        F.col("value").alias("line"),
        F.when(F.col(f"__d.{_CORRUPT}").isNotNull(), F.lit("malformed_csv"))
        .otherwise(F.lit("missing_text"))
        .alias("reason"),
    )


def csv_header_lines(
    spark: SparkSession,
    path: str,
    fields: dict[str, str] | None = None,
    sep: str = ",",
    quote: str = '"',
) -> DataFrame:
    """The lines header elimination drops (r13 advice): ``(file,
    line)`` for every non-blank line whose trimmed, unquoted fields
    equal the declared field-name multiset.  Exactly the predicate
    :func:`read_csv_documents`/:func:`csv_quarantine` drop on (shared
    via ``_csv_header_cond``), exposed as a countable view so
    header-coincident data loss leaves an audit trail instead of
    vanishing.  Expected shape: one row per file of a well-formed
    header'd corpus; more rows than files means data loss — re-read
    with ``header=False``.  Same narrow line-scan as the other views —
    no extra cost unless evaluated."""
    fields = fields or {"text": "string"}
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .where(_csv_header_cond(fields, sep, quote))
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("line"),
        )
    )


def stream_csv_documents(
    spark: SparkSession,
    path: str,
    fields: dict[str, str] | None = None,
    text_field: str = "text",
    id_field: str | None = None,
    source_field: str | None = None,
    sep: str = ",",
    header: bool = True,
    quote: str = '"',
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_csv_documents` (cf.
    :func:`stream_jsonl_documents`) — a CSV drop-directory feeds the
    streaming dedup/curation family directly."""
    fields = fields or {"text": "string"}
    if text_field not in fields:
        raise ValueError(
            f"text_field {text_field!r} is not in fields {list(fields)}"
        )
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    parsed = _parse_csv_lines(reader.text(path), fields, sep, header, quote)
    extras = {n: t for n, t in fields.items()
              if n not in (text_field, id_field, source_field)}
    return _good_rows(parsed, text_field, id_field, source_field, extras)
