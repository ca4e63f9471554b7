"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures — while the codec step itself is stubbed behind
``DECODERS_AVAILABLE`` (the image/audio libraries are not in this container).
Dropping in PIL/torchaudio/ffmpeg turns the stubs into real decoders without
touching any plan shape.

Design: media bytes live in a ``binary`` column next to typed metadata
(media_type, width/height/duration, codec). All per-item work goes through
``mapInPandas`` so bytes move once per Arrow batch, never per row; batch
size is bounded by ``maxRecordsPerBatch`` to keep executor memory flat at
100 TB (large blobs → small batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODERS_AVAILABLE = False  # flip when PIL / soundfile / av are installed

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector.

    Derived from the payload bytes so tests get stable, content-dependent
    values with the exact shape a real extractor would emit.
    """
    if payload is None:
        return [0.0] * dim
    acc, out = 2166136261, []
    for i, b in enumerate(payload[:256]):
        acc = (acc ^ b) * 16777619 % (1 << 32)
        if i % 32 == 31:
            out.append((acc % 10_000) / 10_000.0)
    while len(out) < dim:
        acc = acc * 16777619 % (1 << 32)
        out.append((acc % 10_000) / 10_000.0)
    return out[:dim]


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB: requires PIL."""
    if not DECODERS_AVAILABLE:
        raise NotImplementedError(
            "image decoding requires PIL/pillow — not available in this "
            "environment; extract_features uses a deterministic fake instead"
        )
    raise NotImplementedError


def extract_features(media: DataFrame, *, feature_dim: int = 8) -> DataFrame:
    """Per-item media featurization via mapInPandas (Arrow-batched).

    Real plumbing, stubbed codec: computes byte-level stats + a
    deterministic fake feature vector per item. The iterator-of-batches
    signature means constant memory regardless of input size.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        _fake_feature(p, feature_dim) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing. STUB codec: emits frame *indices* only
    (a real implementation decodes with `av` and emits frame payloads)."""
    return (
        media.where(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length("payload") / every_n).cast("int") - 1, F.lit(0)
                    ),
                )
            ),
        )
        .select("media_id", "frame_idx")
    )


def synthetic_media(spark, documents: DataFrame, *, media_type: str = "image") -> DataFrame:
    """Build a media table from the documents fixture (text bytes as payload)
    so the multimodal plumbing is exercised end-to-end without real codecs."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
