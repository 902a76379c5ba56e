"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, batch iteration,
UDF signatures — is real and tested.  The codec step itself (actual
JPEG/WAV decode) needs native libraries that are not in this
container, so decoders are pluggable: pass ``decoder=`` explicitly, or
the deterministic :func:`fake_decode_image` stands in (clearly marked).
``strict_decode_image`` raises ``NotImplementedError`` to mark the
boundary where a real codec (Pillow/libvips/ffmpeg) plugs in.

Design for 100 TB of media:

- blobs stay in executor memory only per-batch (``mapInPandas`` streams
  Arrow record batches; ``maxRecordsPerBatch`` bounds peak memory);
- metadata (dims, duration, format) lives in ordinary columns so
  filters on it push down *without* touching blobs;
- feature outputs are fixed-width arrays → columnar, joinable with the
  similarity operators in ``matcha_spark.operators.similarity``.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "AUDIO_FEATURES_SCHEMA",
    "fake_decode_image",
    "strict_decode_image",
    "fake_decode_audio",
    "strict_decode_audio",
    "image_features",
    "audio_features",
    "resize_images",
    "frame_sample",
    "image_phash",
    "phash_near_dup_pairs",
    "video_near_dup_pairs",
    "audio_fingerprint",
    "audio_near_dup_pairs",
]

# canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # 'image'|'audio'|'video'
        StructField("format", StringType(), True),  # 'jpeg'|'png'|'wav'|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def strict_decode_image(payload: bytes) -> np.ndarray:
    """The real-decoder plug point.  STUB: image codecs are not
    available in this environment.  Where Pillow exists, use
    :func:`matcha_spark.operators.codecs.pillow_decode_image` (or
    ``codecs.default_image_decoder()``) instead."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "inject one via image_features(decoder=...) — see "
        "operators.codecs.pillow_decode_image"
    )


def _with_id_type(schema: StructType, media: DataFrame) -> StructType:
    """The canonical schemas above document the long-keyed shape; at
    call time the media_id field adopts the INPUT's id type (uuid-keyed
    media tables ride through like the text/embedding families)."""
    idf = media.schema["media_id"]
    return StructType(
        [StructField("media_id", idf.dataType, idf.nullable)]
        + list(schema.fields[1:])
    )


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic FAKE decoder for tests/CI: expands the payload hash
    into an 8×8 'pixel' array.  Marked fake on purpose — it exercises
    the full distributed plumbing with stable outputs."""
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8).astype(np.float32)


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode_image,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``.

    Feature = row-means of the decoded array (stand-in for an embedding
    head).  One Arrow batch in, one out; blobs never accumulate beyond
    a batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                arr = decoder(raw)
                feats.append(arr.mean(axis=1).astype(np.float32).tolist())
                hashes.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": hashes,
                    "n_bytes": sizes,
                    "feature": feats,
                }
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, schema=_with_id_type(IMAGE_FEATURES_SCHEMA, media))


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms", FloatType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def strict_decode_audio(payload: bytes) -> np.ndarray:
    """The real audio-decoder plug point.  STUB: audio codecs are not
    available in this environment.  Where soundfile exists, use
    :func:`matcha_spark.operators.codecs.soundfile_decode_audio` (or
    ``codecs.default_audio_decoder()``) instead."""
    raise NotImplementedError(
        "audio decode requires a codec library (e.g. soundfile/ffmpeg); "
        "inject one via audio_features(decoder=...) — see "
        "operators.codecs.soundfile_decode_audio"
    )


def fake_decode_audio(payload: bytes) -> np.ndarray:
    """Deterministic FAKE decoder: expands the payload hash into a
    256-sample float waveform in [-1, 1).  Exercises the distributed
    plumbing with stable outputs."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * 8)[:256], dtype=np.uint8)
    return (raw.astype(np.float32) - 128.0) / 128.0


def audio_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode_audio,
) -> DataFrame:
    """Decode + feature-extract audio via ``mapInPandas``: sample count,
    RMS energy, zero-crossing count — the classic cheap signal stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, rms, zc = [], [], []
            for payload in pdf["payload"]:
                wave = decoder(bytes(payload) if payload is not None else b"")
                ns.append(len(wave))
                # accumulate in float64: float32 pairwise-mean rounding is
                # numpy-version-dependent, while the float64 sum of exact
                # (k/128)^2 terms is bit-reproducible (and re-derivable in
                # SQL — see the doc_audio_features oracle); the final
                # float32 cast happens at the schema boundary
                rms.append(
                    float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))
                    if len(wave)
                    else 0.0
                )
                zc.append(int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1]))))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_samples": ns, "rms": rms, "zero_crossings": zc}
            )

    auds = media.where(F.col("kind") == "audio").select("media_id", "payload")
    return auds.mapInPandas(run, schema=_with_id_type(AUDIO_FEATURES_SCHEMA, media))


def resize_images(
    media: DataFrame,
    target: tuple[int, int] = (4, 4),
    decoder: Callable[[bytes], np.ndarray] = fake_decode_image,
) -> DataFrame:
    """Resize plumbing: decode → nearest-neighbor downsample (pure numpy
    index striding — a real deployment swaps in a codec + interpolation)
    → re-encode as raw bytes with updated width/height metadata.  Output
    keeps the media-table shape so resized images flow back into any
    downstream media operator."""
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for payload in pdf["payload"]:
                arr = decoder(bytes(payload) if payload is not None else b"")
                h, w = arr.shape[:2]
                rows = np.linspace(0, h - 1, th).round().astype(int)
                cols = np.linspace(0, w - 1, tw).round().astype(int)
                small = arr[np.ix_(rows, cols)]
                payloads.append(small.astype(np.float32).tobytes())
                ws.append(tw)
                hs.append(th)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": "raw_f32",
                    "width": ws,
                    "height": hs,
                    "duration_ms": pdf["duration_ms"],
                    "payload": payloads,
                }
            )

    imgs = media.where(F.col("kind") == "image")
    return imgs.mapInPandas(run, schema=_with_id_type(MEDIA_SCHEMA, media))


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled timestamp with
    the byte-range metadata a real demuxer would fetch.  The payload
    slicing is columnar (no Python in the loop); actual frame decode is
    the pluggable codec step above."""
    vids = media.where(F.col("kind") == "video").where(F.col("duration_ms").isNotNull())
    ts = F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)))
    return vids.select(
        "media_id",
        "format",
        "duration_ms",
        ts.alias("frame_ts_ms"),
    ).withColumn(
        "frame_idx", (F.col("frame_ts_ms") / every_ms).cast("int")
    )


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis (the classic pHash transform), plain
    numpy — no scipy dependency."""
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    c[0, :] = np.sqrt(1.0 / n)
    return c


def _nn_resize(arr: "np.ndarray", h: int, w: int) -> "np.ndarray":
    ys = (np.arange(h) * arr.shape[0] // h).clip(0, arr.shape[0] - 1)
    xs = (np.arange(w) * arr.shape[1] // w).clip(0, arr.shape[1] - 1)
    return arr[np.ix_(ys, xs)]


def image_phash(
    media: DataFrame,
    decoder: Callable[[bytes], "np.ndarray"] = fake_decode_image,
    hash_size: int = 8,
) -> DataFrame:
    """Perceptual hash (classic pHash): decode → nearest-neighbor
    resize to ``(4·hash_size)²`` grayscale → 2-D DCT-II → keep the
    top-left ``hash_size×hash_size`` low-frequency block → threshold
    each coefficient against the block median (DC excluded from the
    median and forced to 0) → 64-bit signature, robust to resizing,
    mild blur/noise, and brightness shifts (all of which perturb high
    frequencies the hash never looks at).

    Output ``(media_id, phash)`` (int64, sign bit possible).  Same
    Arrow-batched plumbing as :func:`image_features`; pair it with
    :func:`~matcha_spark.operators.dedup.banded_hamming_pairs` (wrapped
    as :func:`phash_near_dup_pairs`) for corpus-level near-dup images
    without an all-pairs product."""
    side = 4 * hash_size
    dct = _dct_matrix(side)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                arr = np.asarray(decoder(raw), dtype=np.float64)
                if arr.ndim == 3:  # RGB-ish: luminance mean over channels
                    arr = arr.mean(axis=2)
                arr = _nn_resize(arr, side, side)
                coeffs = (dct @ arr @ dct.T)[:hash_size, :hash_size].copy()
                flat = coeffs.flatten()
                med = np.median(flat[1:])  # DC excluded
                bits = flat > med
                bits[0] = False  # DC carries brightness, not structure
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                out.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.Series(out, dtype="int64"),
                }
            )

    id_t = media.schema["media_id"].dataType.simpleString()
    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, schema=f"media_id {id_t}, phash long")


def phash_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    decoder: Callable[[bytes], "np.ndarray"] = fake_decode_image,
    hash_size: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a < id_b, hamming)`` within a
    pHash Hamming bound — banded equi-join (pigeonhole recall 1.0) +
    popcount verify; the image analog of ``simhash_candidates``."""
    from ..cache import memo_persist
    from .dedup import banded_hamming_pairs

    sig = memo_persist(image_phash(media, decoder=decoder, hash_size=hash_size))
    return banded_hamming_pairs(
        sig, id_col="media_id", sig_col="phash", max_hamming=max_hamming
    )


def fixed_stride_slicer(frames: DataFrame, frame_bytes: int) -> DataFrame:
    """Default demuxer stand-in for :func:`video_near_dup_pairs`: frame
    ``i`` is the byte range ``payload[i*frame_bytes : (i+1)*frame_bytes]``,
    sliced columnarly (codegen ``substring``, no Python).  Tail ranges
    past the payload are dropped, not zero-padded — empty slices would
    spuriously match across videos.

    The injection-point contract (a real container demuxer slots in
    here, mirroring the ``decoder=`` seam in :mod:`.codecs`): input has
    ``(media_id, frame_idx, payload)`` with ``payload`` the FULL video
    bytes; output is one row per decodable frame with ``payload``
    replaced by that frame's bytes (same three columns)."""
    return frames.where(
        F.length(F.col("payload"))
        >= (F.col("frame_idx") + 1) * F.lit(frame_bytes)
    ).select(
        "media_id",
        "frame_idx",
        F.expr(
            f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})"
        ).alias("payload"),
    )


def video_near_dup_pairs(
    media: DataFrame,
    every_ms: int = 1000,
    frame_bytes: int = 4096,
    max_hamming: int = 6,
    min_shared_frames: int = 2,
    decoder: Callable[[bytes], "np.ndarray"] = fake_decode_image,
    hash_size: int = 8,
    frame_slicer: Callable[[DataFrame, int], DataFrame] = fixed_stride_slicer,
) -> DataFrame:
    """Video near-duplicate pairs by frame-signature overlap — the
    standard video-dedup shape (sample frames → perceptual-hash each →
    match frames across videos → count agreements):

    1. :func:`frame_sample` picks one frame per ``every_ms``;
    2. ``frame_slicer`` (the demuxer plug-point, injected like
       ``decoder=``) turns each sampled ``(media_id, frame_idx,
       full-payload)`` row into that frame's bytes — default
       :func:`fixed_stride_slicer` takes deterministic ``frame_bytes``
       strides; a real container parser slots into the same seam;
    3. :func:`image_phash` signs every frame (one Arrow pass);
    4. :func:`~matcha_spark.operators.dedup.banded_hamming_pairs`
       finds frame pairs within ``max_hamming`` (pigeonhole banding,
       never all-pairs), cross-video pairs roll up per video pair.

    Output: ``(vid_a < vid_b, shared_frames)`` for pairs with at least
    ``min_shared_frames`` matching frame pairs (a frame matching two
    frames of the other video contributes twice — agreement mass, not
    distinct-frame count).  Scale: everything pairwise is bounded by
    the Hamming bands; the frame explosion is |videos|·(duration/step).
    """
    from ..cache import cut_lineage
    from .dedup import banded_hamming_pairs

    frames = frame_sample(media, every_ms=every_ms)
    frame_rows = frame_slicer(
        frames.join(media.select("media_id", "payload"), "media_id"),
        frame_bytes,
    )
    # packed frame key: media_id * 1e6 + frame_idx.  Guard the packing
    # invariant AT RUNTIME — a frame_idx >= 1e6 (long video / tiny
    # every_ms) or a negative media_id would silently alias frames into
    # the wrong video on the `div 1000000` decode below, corrupting
    # pair counts; better a loud per-row error than wrong output
    key = F.expr(
        "CASE WHEN frame_idx >= 0 AND frame_idx < 1000000 AND media_id >= 0 "
        "THEN media_id * 1000000 + frame_idx "
        "ELSE raise_error(concat('video_near_dup_pairs: frame key out of "
        "packing range (media_id=', media_id, ', frame_idx=', frame_idx, "
        "'); need 0 <= frame_idx < 1e6 and media_id >= 0 — raise every_ms "
        "or remap media ids')) END"
    )
    sliced = frame_rows.select(
        key.cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        "payload",
    )
    # materialize the (tiny) signature frame once PER CALL
    # (cut_lineage, not the cross-call memo: each call must still pay
    # its own decode): the banded matcher self-joins it, and left lazy
    # both join sides re-ran the demux + frame-decode + pHash chain —
    # the dominant per-task cost of this operator (r18, guide §4/§5)
    sig = cut_lineage(
        image_phash(sliced, decoder=decoder, hash_size=hash_size)
    )
    pairs = banded_hamming_pairs(
        sig, id_col="media_id", sig_col="phash", max_hamming=max_hamming
    )
    vids = (
        pairs.select(
            F.expr("id_a div 1000000").alias("va"),
            F.expr("id_b div 1000000").alias("vb"),
        )
        .where(F.col("va") != F.col("vb"))
        .select(
            F.least("va", "vb").alias("vid_a"),
            F.greatest("va", "vb").alias("vid_b"),
        )
    )
    return (
        vids.groupBy("vid_a", "vid_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .where(F.col("shared_frames") >= min_shared_frames)
    )


def audio_fingerprint(
    media: DataFrame,
    decoder: Callable[[bytes], "np.ndarray"] = fake_decode_audio,
    window: int = 64,
    stride: int = 32,
    n_bands: int = 16,
) -> DataFrame:
    """Chromaprint-style audio sub-fingerprints: decode the clip to a
    waveform, frame it into ``window``-sample windows every ``stride``
    samples, take per-window spectral band energies (|rfft|² folded
    into ``n_bands`` bands), and sign the energy DIFFERENCES between
    adjacent bands AND adjacent windows — the classic Haitsma–Kalker
    bit derivation, robust to volume scaling (differences kill gain)
    and mild noise.  One ``(media_id, win_idx, fp)`` row per window,
    ``fp`` a 64-bit packing of the difference signs.

    Arrow-batched ``mapInPandas`` over audio rows only; numpy rfft per
    window batch, no Python per-sample loops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                wave = decoder(bytes(payload) if payload is not None else b"")
                wave = np.asarray(wave, dtype=np.float64)
                if len(wave) < window + stride:
                    continue
                n_wins = 1 + (len(wave) - window) // stride
                frames = np.lib.stride_tricks.sliding_window_view(
                    wave, window
                )[::stride][:n_wins]
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                # fold bins into n_bands coarse bands
                usable = (spec.shape[1] // n_bands) * n_bands
                bands = spec[:, :usable].reshape(len(frames), n_bands, -1).sum(axis=2)
                # Haitsma-Kalker bit: E(w,b)-E(w,b+1) - (E(w-1,b)-E(w-1,b+1)) > 0
                d_band = bands[:, :-1] - bands[:, 1:]
                d_time = d_band[1:] - d_band[:-1]
                bits = d_time > 0  # (n_wins-1, n_bands-1)
                for wi in range(bits.shape[0]):
                    h = 0
                    for bit in bits[wi]:
                        h = (h << 1) | int(bit)
                    ids.append(media_id)
                    idxs.append(wi)
                    fps.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    id_t = media.schema["media_id"].dataType.simpleString()
    auds = media.where(F.col("kind") == "audio").select("media_id", "payload")
    return auds.mapInPandas(run, schema=f"media_id {id_t}, win_idx int, fp long")


def audio_near_dup_pairs(
    media: DataFrame,
    decoder: Callable[[bytes], "np.ndarray"] = fake_decode_audio,
    min_shared_windows: int = 4,
    window: int = 64,
    stride: int = 32,
    max_fp_windows: int = 1024,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs by sub-fingerprint overlap (the audio
    analog of :func:`video_near_dup_pairs`): clips sharing at least
    ``min_shared_windows`` exact window fingerprints pair up, counted
    by one equi-join on ``fp`` + rollup — never an all-pairs product.
    A hot-fingerprint guard (silence/DC windows collapse to one value
    at corpus scale) drops any fp shared by more than
    ``max_fp_windows`` windows before the join, mirroring the LSH
    bucket cap.

    Recall/flood tradeoff (r16, measured): the guard is mandatory on
    the corpus-scale path, but a corpus whose windows saturate the
    fingerprint space degrades exact-copy recall — clips ALL of whose
    window fps are corpus-hot can no longer reach
    ``min_shared_windows``.  The r16 sf1.0 trend corpus (50k raw
    text-as-bytes clips) measured 44 fps over the default cap and ~6%
    of planted copies losing their pair; raise ``max_fp_windows``
    (recall) or accept the prune (bounded join fan-out) per corpus.
    Real audio's fp entropy sits far above word-salad bytes — r17
    confirmed it by mixing the synthetic clips' bytes through
    splitmix64 (suite ``doc_audio_near_dup``), after which the guard
    stays dormant at sf1.0 and every planted pair survives.

    ``fps`` (r17): precomputed :func:`audio_fingerprint` output over
    the same ``media``/``window``/``stride`` — pass it (persisted) to
    amortize the decode across several cap settings (the suite's
    capped-arm entry runs two)."""
    from ..cache import cut_lineage

    if fps is None:
        # materialize once per call (guide §4/§5, r18): the fingerprint
        # frame feeds the hot-fp aggregate AND both sides of the
        # overlap self-join — left lazy the decode + FFT fingerprint
        # chain executed up to three times.  cut_lineage, not the
        # cross-call memo: callers wanting cross-call amortization pass
        # ``fps`` themselves (the suite's capped-arm entry does).
        fps = cut_lineage(
            audio_fingerprint(
                media, decoder=decoder, window=window, stride=stride
            )
        )
    hot = (
        fps.groupBy("fp")
        .count()
        .where(F.col("count") > max_fp_windows)
        .select("fp")
    )
    pruned = fps.join(hot, "fp", "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("aud_a"),
            F.col("b.media_id").alias("aud_b"),
        )
        .groupBy("aud_a", "aud_b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .where(F.col("shared_windows") >= min_shared_windows)
    )
