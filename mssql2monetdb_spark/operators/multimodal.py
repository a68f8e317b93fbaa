"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode support without external codecs:

- **Images**: real pure-Python decoders for binary PPM (``P6``) and
  uncompressed 24/32-bpp BMP — both are header + raw pixel formats, no
  codec needed. Compressed formats (JPEG/PNG/...) raise
  ``NotImplementedError`` unless ``fake=True``.
- **Audio**: real decoder for PCM WAV (RIFF header + int16 samples).
  Compressed audio raises unless ``fake=True``.
- **Video**: real frame sampler for uncompressed Y4M (YUV4MPEG2 — text
  header + raw planar frames). Compressed containers raise unless
  ``fake=True``.

``fake=True`` keeps the deterministic byte-derived kernels for formats the
container cannot decode, so the Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is exercised either way.

At scale: media rows are large and skewed; ``repartition`` before the
mapInPandas keeps batches bounded, and Arrow batch size is capped by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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


def _decode_ppm(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse binary PPM (P6): header tokens (skipping ``#`` comments), then
    raw RGB bytes. Returns (width, height, pixels[h, w, 3] uint8)."""
    tokens: list[bytes] = []
    pos = 2  # past the b"P6" magic
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(content[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    pixels = np.frombuffer(content, dtype=np.uint8, count=n, offset=pos)
    return width, height, pixels.reshape(height, width, 3)


def _decode_bmp(content: bytes) -> tuple[int, int, np.ndarray]:
    """Parse uncompressed 24/32-bpp BMP (BITMAPINFOHEADER, bottom-up rows
    padded to 4 bytes). Returns (width, height, pixels[h, w, 3] uint8 RGB)."""
    data_offset = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    bgr = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        bgr = bgr[::-1]
    return width, height, bgr[:, :, 2::-1]  # BGR(A) -> RGB


def _real_image_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Decode a codec-free image format and extract an 8-dim feature vector:
    per-channel means and stds (0-255 scale), mean luma, and w/(w+h)."""
    if content[:2] == b"P6":
        width, height, px = _decode_ppm(content)
    elif content[:2] == b"BM":
        width, height, px = _decode_bmp(content)
    else:
        raise NotImplementedError(
            "only uncompressed PPM(P6)/BMP decode without a codec library; "
            f"got magic {content[:2]!r} — pass fake=True for the deterministic "
            "test kernel on compressed formats"
        )
    flat = px.reshape(-1, 3).astype(np.float64)
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
    aspect = width / (width + height)
    return width, height, [float(v) for v in (*means, *stds, luma, aspect)]


def decode_images(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode + feature-extract image payloads via Arrow-batched mapInPandas.

    Real decode (``fake=False``) handles uncompressed PPM(P6)/BMP with the
    pure-Python parsers above; compressed formats need a codec library and
    raise NotImplementedError. ``fake=True`` substitutes the deterministic
    byte-derived kernel for any payload.
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
                if fake:
                    width, height, feats = _fake_image_decode(content)
                else:
                    width, height, feats = _real_image_decode(content)
                rows.append((media_id, len(content), checksum, width, height, feats))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "checksum", "width", "height", "features"],
            )

    return media.select("media_id", "content").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def resize_images(
    media: DataFrame, *, dst_w: int = 3, dst_h: int = 3, fake: bool = False
) -> DataFrame:
    """Nearest-neighbor resize of image payloads via Arrow-batched
    mapInPandas (the thumbnail/normalization step of a multimodal training
    pipeline), emitting per-channel means of the RESIZED image.

    The index map is the exact integer form ``src_idx = (i * src) // dst``
    — reproducible everywhere, no float rounding — and the channel means
    divide an exact integer pixel sum by the constant pixel count, so the
    doubles are bit-identical cross-engine (same discipline as
    decode_images). Real path decodes PPM(P6)/BMP; compressed formats need
    a codec and raise; ``fake=True`` derives everything from the bytes.

    Scale shape: one narrow Python stage, no shuffle; batch memory is
    bounded by payload size exactly like the decode kernels.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None, None, None, None, None))
                    continue
                content = bytes(content)
                if fake:
                    crc = zlib.crc32(content)
                    sw, sh = 16 + (crc & 0xFF), 16 + ((crc >> 8) & 0xFF)
                    means = [float((crc >> (8 * c)) & 0xFF) for c in range(3)]
                    rows.append((media_id, sw, sh, dst_w, dst_h, *means))
                    continue
                if content[:2] == b"P6":
                    sw, sh, px = _decode_ppm(content)
                elif content[:2] == b"BM":
                    sw, sh, px = _decode_bmp(content)
                else:
                    raise NotImplementedError(
                        "only uncompressed PPM(P6)/BMP resize without a codec "
                        f"library; got magic {content[:2]!r}"
                    )
                ri = (np.arange(dst_h) * sh) // dst_h
                ci = (np.arange(dst_w) * sw) // dst_w
                resized = px[ri][:, ci]
                n = dst_w * dst_h
                means = [
                    int(resized[:, :, c].astype(np.int64).sum()) / n for c in range(3)
                ]
                rows.append((media_id, sw, sh, dst_w, dst_h, *means))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height",
                    "width", "height", "mean_r", "mean_g", "mean_b",
                ],
            )

    return media.select("media_id", "content").mapInPandas(kernel, RESIZE_SCHEMA)


def _parse_y4m(content: bytes) -> tuple[int, int, list[bytes]]:
    """Parse uncompressed Y4M (YUV4MPEG2): text header, then per-frame
    ``FRAME...\\n`` markers followed by raw planar YUV bytes.

    Supports C420 (default, 1.5 bytes/px) and C444 (3 bytes/px). Returns
    (width, height, raw frame payloads).
    """
    nl = content.index(0x0A)
    header = content[:nl].decode("ascii", "strict")
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = 0
    colorspace = "C420"
    for f in fields[1:]:
        if f.startswith("W"):
            width = int(f[1:])
        elif f.startswith("H"):
            height = int(f[1:])
        elif f.startswith("C"):
            colorspace = f
    if width <= 0 or height <= 0:
        raise ValueError("Y4M header missing W/H")
    if colorspace.startswith("C420"):
        frame_size = width * height * 3 // 2
    elif colorspace == "C444":
        frame_size = width * height * 3
    else:
        raise NotImplementedError(f"Y4M colorspace {colorspace} not supported")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(content):
        marker_end = content.index(0x0A, pos)
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = marker_end + 1
        frames.append(content[pos : pos + frame_size])
        pos += frame_size
    return width, height, frames


def sample_video_frames(media: DataFrame, *, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads.

    Real decode (``fake=False``) parses uncompressed Y4M with the
    pure-Python reader above and emits the raw YUV bytes of each sampled
    frame; compressed containers need a codec and raise NotImplementedError.
    ``fake=True`` keeps the deterministic byte-slicing kernel (every_n is a
    byte stride there).

    Output: one row per sampled frame (media_id, frame_idx, frame: binary).
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
                content = bytes(content)
                if fake:
                    for i, off in enumerate(range(0, len(content), every_n)):
                        out.append((media_id, i, content[off : off + every_n]))
                    continue
                if content[:9] != b"YUV4MPEG2":
                    raise NotImplementedError(
                        "only uncompressed Y4M decodes without a codec library; "
                        "pass fake=True for the deterministic test kernel"
                    )
                _, _, frames = _parse_y4m(content)
                for i, frame in enumerate(frames[::every_n]):
                    out.append((media_id, i, frame))
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


def _decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Parse PCM WAV (RIFF container, int16 samples) without a codec library.

    Walks the chunk list (fmt / data may be preceded by LIST etc.) and
    returns (mono samples float64 in [-1, 1], sample_rate).
    """
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV decodes without a codec library; pass fake=True "
            "for the deterministic test kernel on compressed formats"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples.astype(np.float64) / 32768.0, sample_rate


def extract_audio_features(media: DataFrame, *, sample_rate: int = 16000, fake: bool = False) -> DataFrame:
    """Audio feature extraction via Arrow-batched mapInPandas.

    Real decode (``fake=False``) parses PCM WAV with the pure-Python RIFF
    reader above: true duration from the sample count, and an 8-dim
    MFCC-like vector = per-segment RMS over 8 equal time windows.
    Compressed audio needs a codec and raises NotImplementedError;
    ``fake=True`` keeps the deterministic byte-derived kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((media_id, None, None, None))
                    continue
                content = bytes(content)
                if fake:
                    duration = len(content) / (2.0 * sample_rate)
                    crc = zlib.crc32(content)
                    feats = [
                        float(((crc >> (i * 4)) & 0xFF) - 128) / 128.0
                        for i in range(FEATURE_DIM)
                    ]
                else:
                    samples, rate = _decode_wav(content)
                    duration = len(samples) / float(rate)
                    segments = np.array_split(samples, FEATURE_DIM)
                    feats = [
                        float(np.sqrt(np.mean(np.square(s)))) if len(s) else 0.0
                        for s in segments
                    ]
                rows.append((media_id, len(content), duration, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "duration_est_s", "mfcc_like"]
            )

    return media.select("media_id", "content").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def byte_histogram_arrow(media: DataFrame, *, buckets: int = 16) -> DataFrame:
    """High-nibble byte histogram per payload via ``mapInArrow`` — the
    zero-copy rung of the Python ladder (mapInPandas converts Arrow
    buffers to pandas objects per batch; mapInArrow hands the RecordBatch
    straight to numpy, which matters when the column is gigabyte-scale
    binary). 16 buckets = byte >> 4: a cheap content fingerprint
    (text/compressed/random payloads separate cleanly) used as a triage
    pass before any real decode.

    Batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    like every other Arrow kernel here; output is one row per input row,
    so the stage is narrow (no shuffle) and fuses with the scan.
    """
    import pyarrow as pa

    if buckets != 16:
        raise ValueError("fingerprint histogram is fixed at 16 high-nibble buckets")

    def hist_batches(batches):
        for batch in batches:
            ids = batch.column("media_id")
            contents = batch.column("content")
            hists = []
            for i in range(batch.num_rows):
                if not contents[i].is_valid:
                    hists.append(None)
                    continue
                buf = memoryview(contents[i].as_buffer())
                arr = np.frombuffer(buf, dtype=np.uint8)
                hists.append(np.bincount(arr >> 4, minlength=16).astype("int64").tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(hists, type=pa.list_(pa.int64()))],
                names=["media_id", "nibble_hist"],
            )

    return media.select("media_id", "content").mapInArrow(
        hist_batches, schema="media_id bigint, nibble_hist array<bigint>"
    )
