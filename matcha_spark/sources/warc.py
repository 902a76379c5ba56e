"""WARC web-archive ingestion — the format web-crawl corpora actually
arrive in (ISO 28500; Common Crawl ships ~1 GB ``.warc.gz`` segments).

Pure-struct parser in the :mod:`matcha_spark.codecs` tradition: WARC is
a public, simple framing format (version line, ``Name: value`` headers,
``Content-Length`` block, CRLF CRLF trailer) and the HTTP payload
inside a ``response`` record is equally mechanical, so no external
library is needed — stdlib ``zlib`` handles the per-record gzip
members.

Scale shape: WARC files are read whole via ``binaryFile`` (gzip members
make byte-range splitting impossible without a side index), so the
parallelism unit is the FILE — exactly how the ecosystem shards crawls
(Common Crawl: ~80k files × ~1 GB per snapshot; a 1000-executor
cluster keeps every core busy on file granularity alone).  Peak task
memory is one file + its largest decompressed record; Spark's
``binaryFile`` caps files at 2 GB, comfortably above the conventional
segment size.  Parsing is one forward pass per file inside an
Arrow-batched ``mapInPandas`` kernel — no driver traffic, no shuffle;
downstream operators (dedup, quality, lang-id) see the standard
``documents`` shape immediately.

Malformed input follows the corpus-source convention
(``sources/corpus.py``): :func:`read_warc_documents` silently excludes
records it cannot parse; :func:`warc_malformed` re-reads the same files
and reports one ``(file, offset, reason)`` row per rejection — an audit
trail, never a job failure.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc_documents", "warc_malformed", "stream_warc_documents"]

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

_DOC_SCHEMA = (
    "doc_id string, url string, date string, content_type string, "
    "text string, source string"
)
_DOC_SCHEMA_PAYLOAD = _DOC_SCHEMA + ", payload binary"
_BAD_SCHEMA = "file string, offset long, reason string"


def _gunzip_members(buf: bytes) -> tuple[bytes, str | None]:
    """Decompress a (possibly multi-member) gzip buffer member by
    member.  Returns ``(bytes_decoded_so_far, reason|None)`` — a
    truncated or corrupt tail yields the members that DID decode plus
    the failure reason, instead of throwing away the whole file the
    way one-shot ``gzip.decompress`` would."""
    out = io.BytesIO()
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(buf[pos:]) + d.flush()
        except zlib.error as e:
            return out.getvalue(), f"gzip_error:{e}"
        if not d.eof:
            # a truncated member's partial output is NOT appended: a
            # half-decoded record would just re-surface as a confusing
            # truncated_header/block row in the audit view
            return out.getvalue(), "gzip_truncated"
        out.write(chunk)
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: no forward progress
            return out.getvalue(), "gzip_stalled"
        pos += consumed
    return out.getvalue(), None


def _parse_headers(block: bytes) -> dict[str, str]:
    """``Name: value`` lines → lower-cased dict (both WARC named fields
    and HTTP headers use the same RFC-822-ish syntax; continuation
    lines are folded per the spec)."""
    hdrs: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            hdrs[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, val = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        hdrs[last] = val.strip().decode("latin-1")
    return hdrs


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer encoding (captured verbatim in a
    WARC response block).  A malformed chunk frame returns the body
    as-is — better a slightly noisy text than a dropped document."""
    out = io.BytesIO()
    pos = 0
    while True:
        nl = body.find(_CRLF, pos)
        if nl < 0:
            return body
        size_tok = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        if size == 0:
            return out.getvalue()
        start = nl + 2
        end = start + size
        if end > len(body):
            return body
        out.write(body[start:end])
        pos = end + 2  # skip the chunk's trailing CRLF


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset" and v.strip():
            return v.strip().strip('"').strip("'")
    return "utf-8"


def _decode_payload(body: bytes, content_type: str) -> str:
    try:
        return body.decode(_charset_of(content_type), errors="replace")
    except LookupError:  # unknown charset label in the wild
        return body.decode("utf-8", errors="replace")


def _iter_records(data: bytes) -> Iterator[tuple[int, dict | None, str | None]]:
    """Walk a decompressed WARC buffer: yields ``(offset, record, None)``
    for each well-formed record and ``(offset, None, reason)`` for each
    rejection, then resynchronizes on the next ``WARC/`` version line so
    one bad record never swallows the rest of the file."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (the spec's two CRLFs, plus any junk
        # a resync landed us in front of)
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        start = pos
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"\r\nWARC/", pos)
            yield start, None, "not_a_record"
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            yield start, None, "truncated_header"
            return
        hdrs = _parse_headers(data[pos:hdr_end])
        try:
            clen = int(hdrs.get("content-length", ""))
            if clen < 0:
                raise ValueError("negative")
        except ValueError:
            yield start, None, "bad_content_length"
            nxt = data.find(b"\r\nWARC/", hdr_end)
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        if body_end > n:
            yield start, None, "truncated_block"
            return
        hdrs["__body"] = data[body_start:body_end]  # type: ignore[assignment]
        yield start, hdrs, None
        pos = body_end


def _http_payload(body: bytes) -> tuple[str, bytes, str | None]:
    """Split an HTTP response block: returns ``(content_type, payload,
    err)`` with chunked transfer undone.  A block with no header
    terminator is treated as headerless payload.

    ``err`` (r12 advice, widened r13) is ``"content_encoding_failed"``
    when a declared non-identity Content-Encoding cannot be undone —
    gzip that will not inflate, or an encoding with no decoder here
    (br/deflate/zstd/...): the payload stays COMPRESSED in that case,
    and decoding those bytes as the declared charset would produce
    replacement-character soup that flows into downstream curation
    looking like a document — the caller must quarantine instead
    (empty text; ``warc_malformed`` reports the record).  An EMPTY
    body is never an encoding failure (nothing to inflate), and a
    gzip body that inflates to empty is a success, not a failure."""
    cut = body.find(_HDR_END)
    if cut < 0 or not body[:5] in (b"HTTP/",):
        return "", body, None
    hh = _parse_headers(body[:cut])
    payload = body[cut + len(_HDR_END):]
    if "chunked" in hh.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    enc = hh.get("content-encoding", "").strip().lower()
    if enc and enc != "identity" and payload:
        if enc in ("gzip", "x-gzip"):
            got, err = _gunzip_members(payload)
            if err is None:
                payload = got
            else:
                return hh.get("content-type", ""), payload, "content_encoding_failed"
        else:
            return hh.get("content-type", ""), payload, "content_encoding_failed"
    return hh.get("content-type", ""), payload, None


def _file_records(name: str, content: bytes):
    """(offset, record|None, reason|None) for one WARC file, gunzipping
    first when the content is gzip (multi-member or whole-file)."""
    if content[:2] == b"\x1f\x8b":
        data, err = _gunzip_members(content)
        for item in _iter_records(data):
            yield item
        if err is not None:
            yield len(data), None, err
    else:
        yield from _iter_records(content)


def _records_to_docs(
    name: str,
    content: bytes,
    record_types: tuple[str, ...],
    with_payload: bool = False,
):
    base = name.rsplit("/", 1)[-1]
    for _off, rec, reason in _file_records(name, content):
        if rec is None:
            continue
        rtype = rec.get("warc-type", "")
        if rtype not in record_types:
            continue
        body = rec["__body"]
        enc_err = None
        if rtype == "response":
            ctype, payload, enc_err = _http_payload(body)
            ctype = ctype or rec.get("content-type", "")
        else:  # resource / conversion: the block IS the content
            ctype, payload = rec.get("content-type", ""), body
        main = ctype.split(";")[0].strip().lower()
        row = {
            "doc_id": rec.get("warc-record-id", "").strip("<>"),
            "url": rec.get("warc-target-uri", ""),
            "date": rec.get("warc-date", ""),
            "content_type": main,
            # binary media decoded to replacement-soup is useless AND
            # expensive to carry twice — text stays empty for non-text
            # payloads in payload mode.  A failed Content-Encoding
            # (enc_err) leaves payload COMPRESSED: decoding it as the
            # declared charset would be garbage-as-document, so text is
            # quarantined empty and warc_malformed reports the record
            "text": (
                ""
                if enc_err is not None
                or (with_payload and not _is_texty(main))
                else _decode_payload(payload, ctype)
            ),
            "source": base,
        }
        if with_payload:
            row["payload"] = payload
        yield row


def _is_texty(content_type: str) -> bool:
    return content_type.startswith("text/") or content_type in (
        "application/json", "application/xml", "application/xhtml+xml",
        "application/javascript", "",
    )


def read_warc_documents(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    with_payload: bool = False,
) -> DataFrame:
    """WARC crawl archive → ``(doc_id, url, date, content_type, text,
    source)`` documents.

    ``record_types`` selects which WARC record types become documents
    (default ``response`` — the fetched pages; add ``"resource"`` /
    ``"conversion"`` for crawler-stored or re-derived content —
    ``("conversion",)`` reads Common-Crawl-style WET extracted-text
    files, which are ordinary WARC files of conversion records).  For
    responses the HTTP envelope is stripped: chunked transfer decoded,
    gzip content-encoding inflated, text decoded per the declared
    charset (``errors="replace"`` — crawl data lies about encodings).
    ``doc_id`` is the record's ``WARC-Record-ID`` (globally unique per
    spec, so the id contract of the incremental dedup family holds
    across segments); ``source`` is the segment file's basename.

    ``with_payload=True`` adds the raw (envelope-stripped) bytes as a
    ``payload`` column and leaves ``text`` empty for non-text content
    types — the bridge into the multimodal family: crawled images flow
    ``read_warc_documents(with_payload=True)`` → rename to the media
    shape → ``codecs.sniff_decode_image`` / pHash near-dup.

    Malformed records are excluded here and reported by
    :func:`warc_malformed`; a bad record never fails the read, and the
    parser resynchronizes on the next version line so one corrupt
    record doesn't swallow its segment."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)
    cols = ["doc_id", "url", "date", "content_type", "text", "source"]
    if with_payload:
        cols = cols + ["payload"]

    def kernel(batches):
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    _records_to_docs(
                        name, bytes(content), record_types, with_payload
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return binf.select("path", "content").mapInPandas(
        kernel, schema=_DOC_SCHEMA_PAYLOAD if with_payload else _DOC_SCHEMA
    )


def stream_warc_documents(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_warc_documents` — the same parse
    kernel over ``readStream.format("binaryFile")``, so a drop
    directory of crawl segments feeds the streaming dedup/admission
    family (``streaming/dedup.stream_incremental_dedup``) as segments
    land.  ``maxFilesPerTrigger`` sizes micro-batches in SEGMENTS (the
    natural unit: one ~1 GB file ≈ tens of thousands of documents).
    Malformed records are silently excluded here, as in the streaming
    JSONL source — audit landed segments with :func:`warc_malformed`."""
    import pandas as pd

    reader = spark.readStream.format("binaryFile")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    # binaryFile streaming requires an explicit schema
    binf = reader.schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).load(path)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_to_docs(name, bytes(content), record_types))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "url", "date", "content_type", "text", "source",
                ],
            )

    return binf.select("path", "content").mapInPandas(kernel, schema=_DOC_SCHEMA)


def warc_malformed(spark: SparkSession, path: str) -> DataFrame:
    """The records :func:`read_warc_documents` rejected or quarantined,
    with why: ``(file, offset, reason)`` where reason ∈
    {``not_a_record``, ``truncated_header``, ``bad_content_length``,
    ``truncated_block``, ``gzip_truncated``, ``gzip_error:*``,
    ``content_encoding_failed``} and ``offset`` is the byte position
    in the DECOMPRESSED stream — a distributed audit trail mirroring
    :func:`jsonl_quarantine`.  ``content_encoding_failed`` (r12,
    widened r13) marks response records whose declared non-identity
    Content-Encoding could not be undone — gzip that would not
    inflate, or an encoding with no decoder here (br, deflate, zstd,
    ...): the read emits them with EMPTY text (never compressed bytes
    decoded as charset soup), and this view is where they surface.
    Empty bodies are exempt — nothing to inflate is not a failure."""
    import pandas as pd

    binf = spark.read.format("binaryFile").load(path)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for name, content in zip(pdf["path"], pdf["content"]):
                for off, rec, reason in _file_records(name, bytes(content)):
                    if rec is None:
                        rows.append(
                            {"file": name.rsplit("/", 1)[-1],
                             "offset": off, "reason": reason}
                        )
                    elif rec.get("warc-type", "") == "response":
                        _, _, enc_err = _http_payload(rec["__body"])
                        if enc_err is not None:
                            rows.append(
                                {"file": name.rsplit("/", 1)[-1],
                                 "offset": off, "reason": enc_err}
                            )
            yield pd.DataFrame(rows, columns=["file", "offset", "reason"])

    return binf.select("path", "content").mapInPandas(kernel, schema=_BAD_SCHEMA)
