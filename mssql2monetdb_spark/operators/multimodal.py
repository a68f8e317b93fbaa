"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS:
``decode_image``/``extract_audio_features``/``sample_video_frames`` raise
``NotImplementedError`` unless ``fake=True``, in which case they produce a
deterministic fake derived from the bytes (so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is fully real and tested).

At scale: media rows are large and skewed; ``repartition`` before the
mapInPandas keeps batches bounded, and Arrow batch size is capped by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8


def as_media(df: DataFrame, payload_col: str, id_col: str, mime: str) -> DataFrame:
    """Wrap any string payload column as a MEDIA_SCHEMA DataFrame (used by
    tests to synthesize binary rows from the documents fixture)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.lit(mime).alias("mime"),
        F.create_map(F.lit("origin"), F.lit(payload_col)).alias("meta"),
    )


def _fake_image_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake 'decode': dims and features from byte content."""
    crc = zlib.crc32(content)
    width = 16 + (crc & 0xFF)
    height = 16 + ((crc >> 8) & 0xFF)
    feats = [float((crc >> (i * 3)) & 0x3FF) / 1024.0 for i in range(FEATURE_DIM)]
    return width, height, feats


def decode_images(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode + feature-extract image payloads via Arrow-batched mapInPandas.

    Real decode requires an image codec (not in this container): the kernel
    raises NotImplementedError unless ``fake=True``. Everything around the
    kernel — batch iteration, schema, null payloads — is production-shaped.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None, None, None))
                    continue
                content = bytes(content)
                checksum = hashlib.md5(content).hexdigest()
                if not fake:
                    raise NotImplementedError(
                        "image decode requires an image codec library (e.g. Pillow); "
                        "not available in this environment — pass fake=True for the "
                        "deterministic test kernel"
                    )
                width, height, feats = _fake_image_decode(content)
                rows.append((media_id, len(content), checksum, width, height, feats))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "checksum", "width", "height", "features"],
            )

    return media.select("media_id", "content").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, *, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video payloads (stubbed decode).

    Output: one row per sampled frame (media_id, frame_idx, frame: binary).
    The fake kernel slices the payload bytes deterministically.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, bytes]] = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a codec library (e.g. PyAV); pass "
                        "fake=True for the deterministic test kernel"
                    )
                content = bytes(content)
                for i, off in enumerate(range(0, len(content), every_n)):
                    out.append((media_id, i, content[off : off + every_n]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "content").mapInPandas(kernel, schema)


def binary_meta(media: DataFrame) -> DataFrame:
    """JVM-side metadata over binary payloads (no Python): size + checksum.

    This is the hot-path-safe subset — anything expressible on bytes without
    a codec stays out of mapInPandas entirely.
    """
    return media.select(
        "media_id",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("checksum"),
        F.col("mime"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("duration_est_s", FloatType(), True),
        StructField("mfcc_like", ArrayType(FloatType()), True),
    ]
)


def extract_audio_features(media: DataFrame, *, sample_rate: int = 16000, fake: bool = False) -> DataFrame:
    """Audio feature extraction plumbing (stubbed decode).

    Real decode needs an audio codec (librosa/soundfile — not in this
    container); the fake kernel derives a duration estimate (bytes at
    16-bit mono ``sample_rate``) and an 8-dim MFCC-like vector from byte
    statistics, so batching/schema/partitioning are fully exercised.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None))
                    continue
                content = bytes(content)
                if not fake:
                    raise NotImplementedError(
                        "audio decode requires a codec library (e.g. soundfile); "
                        "pass fake=True for the deterministic test kernel"
                    )
                duration = len(content) / (2.0 * sample_rate)
                crc = zlib.crc32(content)
                feats = [
                    float(((crc >> (i * 4)) & 0xFF) - 128) / 128.0 for i in range(FEATURE_DIM)
                ]
                rows.append((media_id, len(content), duration, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "duration_est_s", "mfcc_like"]
            )

    return media.select("media_id", "content").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
