"""Real MP4 container demuxing for the video-dedup frame seam.

The r08/r09 rounds shipped :func:`~.multimodal.video_near_dup_pairs`
with a pluggable ``frame_slicer=`` injection point and a fixed-stride
stand-in; this module fills the seam with an actual ISO BMFF (MP4/MOV)
sample-table parser — which needs NO codec libraries: locating each
sample's byte range is pure box-structure arithmetic over the
``moov/trak/mdia/minf/stbl`` atoms (``stsz`` sample sizes, ``stsc``
sample-to-chunk mapping, ``stco``/``co64`` chunk offsets), exactly what
a storage-side demuxer does before any decoder runs.  Frame DECODE (the
codec step) remains the pluggable ``decoder=`` seam in
:mod:`.codecs` — this module only turns "container bytes" into
"per-sample byte ranges", the part that is pure public-spec structure
(ISO/IEC 14496-12).

Scale shape: :func:`mp4_frame_slicer` is an Arrow-batched
``mapInPandas`` with a per-batch parse memo — one container parse per
media per batch even though the input carries one row per sampled
frame — and the per-sample slicing is byte-range arithmetic, no
per-byte Python.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

__all__ = ["parse_mp4_samples", "mp4_frame_slicer", "write_mp4"]

# containers whose children are themselves boxes (the walk recurses
# only where the spec nests, instead of guessing)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield ``(type, body_start, box_end)`` for the boxes in
    ``buf[start:end]`` — 32-bit sizes, 64-bit ``largesize`` (size == 1)
    and to-end-of-enclosure (size == 0) forms per ISO/IEC 14496-12
    §4.2.  Malformed sizes raise (truncated/overlapping boxes must not
    silently yield wrong sample ranges)."""
    off = start
    while off + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, off)
        if size == 1:
            if off + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            header = 16
        elif size == 0:
            size = end - off
            header = 8
        else:
            header = 8
        if size < header or off + size > end:
            raise ValueError(f"mp4: malformed box size {size} at {off}")
        yield btype, off + header, off + size
        off += size


def _find_boxes(buf: bytes, start: int, end: int, path: tuple) -> list[tuple[int, int]]:
    """Body ranges of every box at the nested ``path`` (e.g.
    ``(b"moov", b"trak")`` → all traks)."""
    spans = [(start, end)]
    for want in path:
        nxt = []
        for s, e in spans:
            for btype, bs, be in _iter_boxes(buf, s, e):
                if btype == want:
                    nxt.append((bs, be))
        spans = nxt
        if not spans:
            return []
    return spans


def _full_box_body(buf: bytes, s: int) -> int:
    """Skip a FullBox's version/flags word; returns the payload start."""
    return s + 4


def parse_mp4_samples(payload: bytes, handler: bytes = b"vide") -> list[tuple[int, int]]:
    """Absolute ``(offset, size)`` byte ranges of every sample in the
    first trak whose media handler matches ``handler`` (default video),
    falling back to the first trak carrying a sample table when no
    handler box matches — the demux core of the MP4 frame slicer.

    Sample ranges come from the three mandatory ``stbl`` atoms: sizes
    from ``stsz`` (fixed or per-sample), chunk base offsets from
    ``stco``/``co64``, and the run-length sample-to-chunk mapping from
    ``stsc`` (each entry covers chunks up to the next entry's
    ``first_chunk``; samples within a chunk are contiguous).  Offsets
    are FILE-absolute per spec — they point into ``mdat`` wherever it
    lives, before or after ``moov``.  Raises ``ValueError`` on
    structurally broken containers; returns ``[]`` when the trak has
    zero samples."""
    buf = bytes(payload)
    end = len(buf)
    traks = _find_boxes(buf, 0, end, (b"moov", b"trak"))
    if not traks:
        raise ValueError("mp4: no moov/trak found")

    chosen = None
    fallback = None
    for ts, te in traks:
        mdias = _find_boxes(buf, ts, te, (b"mdia",))
        if not mdias:
            continue
        ms, me = mdias[0]
        hdlr = _find_boxes(buf, ms, me, (b"hdlr",))
        stbls = _find_boxes(buf, ms, me, (b"minf", b"stbl"))
        if not stbls:
            continue
        if fallback is None:
            fallback = stbls[0]
        if hdlr:
            hs, he = hdlr[0]
            # FullBox(4) + pre_defined(4) + handler_type(4)
            if he - hs >= 12 and buf[hs + 8 : hs + 12] == handler:
                chosen = stbls[0]
                break
    stbl = chosen or fallback
    if stbl is None:
        raise ValueError("mp4: no sample table in any trak")
    ss, se = stbl

    def one(name: bytes) -> tuple[int, int]:
        found = _find_boxes(buf, ss, se, (name,))
        if not found:
            raise ValueError(f"mp4: missing {name.decode()} box")
        return found[0]

    # stsz: fixed sample_size or per-sample table
    zs, ze = one(b"stsz")
    p = _full_box_body(buf, zs)
    fixed_size, n_samples = struct.unpack_from(">II", buf, p)
    if fixed_size:
        # sanity-bound the count BEFORE materializing: a tiny hostile
        # container claiming 2^32 samples must not allocate gigabytes
        if fixed_size * n_samples > end:
            raise ValueError("mp4: stsz claims more sample bytes than payload")
        sizes = [fixed_size] * n_samples
    else:
        if p + 8 + 4 * n_samples > ze:
            raise ValueError("mp4: truncated stsz table")
        sizes = list(struct.unpack_from(f">{n_samples}I", buf, p + 8))

    # stco / co64: chunk base offsets
    co = _find_boxes(buf, ss, se, (b"stco",))
    wide = False
    if not co:
        co = _find_boxes(buf, ss, se, (b"co64",))
        wide = True
    if not co:
        raise ValueError("mp4: missing stco/co64 box")
    cs, ce = co[0]
    p = _full_box_body(buf, cs)
    (n_chunks,) = struct.unpack_from(">I", buf, p)
    fmt = f">{n_chunks}Q" if wide else f">{n_chunks}I"
    if p + 4 + struct.calcsize(fmt) > ce:
        raise ValueError("mp4: truncated chunk-offset table")
    chunk_offsets = list(struct.unpack_from(fmt, buf, p + 4))

    # stsc: (first_chunk, samples_per_chunk) runs
    ks, ke = one(b"stsc")
    p = _full_box_body(buf, ks)
    (n_ent,) = struct.unpack_from(">I", buf, p)
    if p + 4 + 12 * n_ent > ke:
        raise ValueError("mp4: truncated stsc table")
    ents = [
        struct.unpack_from(">III", buf, p + 4 + 12 * i)[:2] for i in range(n_ent)
    ]

    # expand: entry i covers chunks [first_i, first_{i+1})
    out: list[tuple[int, int]] = []
    si = 0
    prev_first = 0
    for i, (first, per_chunk) in enumerate(ents):
        # first_chunk is 1-based and strictly increasing per spec; a
        # malformed 0 would Python-wrap chunk_offsets[-1] silently
        if first < 1 or first <= prev_first:
            raise ValueError("mp4: stsc first_chunk not positive-increasing")
        prev_first = first
        last = ents[i + 1][0] - 1 if i + 1 < len(ents) else n_chunks
        for c in range(first, last + 1):
            if c - 1 >= n_chunks or si >= n_samples:
                break
            off = chunk_offsets[c - 1]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                size = sizes[si]
                if off + size > end:
                    raise ValueError("mp4: sample range past end of payload")
                out.append((off, size))
                off += size
                si += 1
    return out


def mp4_frame_slicer(frames: DataFrame, frame_bytes: int) -> DataFrame:
    """Real-container drop-in for
    :func:`~.multimodal.fixed_stride_slicer` (same injection contract:
    ``(media_id, frame_idx, payload)`` in, one row per decodable frame
    with ``payload`` replaced by that frame's bytes): frame ``i`` is
    the i-th SAMPLE of the MP4 container's video trak, located via
    :func:`parse_mp4_samples`.  ``frame_bytes`` caps each emitted
    sample (0/None = uncapped) so a pathological multi-megabyte sample
    cannot balloon an Arrow batch.  Rows whose ``frame_idx`` is past
    the trak's sample count are dropped (the fixed-stride tail rule);
    an unparseable container raises — feed this slicer only rows you
    know are MP4, or pre-filter on ``format``.

    One ``mapInPandas`` pass; containers are parsed once per media per
    batch (memo keyed by ``media_id``) even though the input repeats
    the full payload on every sampled-frame row."""
    import pandas as pd

    cap = int(frame_bytes or 0)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            memo: dict = {}
            ids, idxs, outs = [], [], []
            for media_id, frame_idx, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                samples = memo.get(media_id)
                if samples is None:
                    samples = parse_mp4_samples(
                        bytes(payload) if payload is not None else b""
                    )
                    memo[media_id] = samples
                if frame_idx >= len(samples):
                    continue
                off, size = samples[int(frame_idx)]
                if cap:
                    size = min(size, cap)
                ids.append(media_id)
                idxs.append(frame_idx)
                outs.append(bytes(payload)[off : off + size])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "payload": pd.Series(outs, dtype="object"),
                }
            )

    id_t = frames.schema["media_id"].dataType.simpleString()
    return frames.select("media_id", "frame_idx", "payload").mapInPandas(
        run, schema=f"media_id {id_t}, frame_idx int, payload binary"
    )


def write_mp4(samples: list, chunks: list | None = None) -> bytes:
    """Minimal single-trak ISO BMFF writer — the structural inverse of
    :func:`parse_mp4_samples` (ftyp + mdat + moov with a video trak
    carrying the three mandatory stbl atoms).  Not a playable encode
    (no codec config, no timing atoms beyond what the demux needs) —
    it exists so pipelines and the suite can round-trip REAL container
    structure through the demuxer without any media libraries:
    ``parse_mp4_samples(write_mp4(samples))`` slices back exactly
    ``samples``.  ``chunks`` optionally splits the samples across
    several mdat chunk runs (default: one chunk)."""
    samples = [bytes(s) for s in samples]
    # zero samples is a VALID trak (empty doc → empty container): no
    # chunks, empty tables — the parser returns [] for it
    chunks = list(chunks) if chunks else ([len(samples)] if samples else [])
    if sum(chunks) != len(samples) or any(c < 1 for c in chunks):
        raise ValueError("chunks must be positive and sum to len(samples)")

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(payload), btype) + payload

    def full(btype: bytes, payload: bytes) -> bytes:
        return box(btype, b"\x00\x00\x00\x00" + payload)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = box(b"mdat", b"".join(samples))
    data_off = len(ftyp) + 8
    offsets, si, off = [], 0, data_off
    for n in chunks:
        offsets.append(off)
        for _ in range(n):
            off += len(samples[si])
            si += 1
    stco = full(
        b"stco",
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    ents = []
    for i, n in enumerate(chunks):
        if i == 0 or n != chunks[i - 1]:
            ents.append((i + 1, n))
    stsc = full(
        b"stsc",
        struct.pack(">I", len(ents))
        + b"".join(struct.pack(">III", fc, n, 1) for fc, n in ents),
    )
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    stbl = box(b"stbl", stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", mdia)
    moov = box(b"moov", trak)
    return ftyp + mdat + moov
