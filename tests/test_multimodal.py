"""Multimodal plumbing: mapInPandas kernels (deterministic fake decode),
schema/batching correctness, and the NotImplementedError gate for real
codecs (which aren't in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mssql2monetdb_spark.catalog import load_table
from mssql2monetdb_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    return multimodal.as_media(docs, "text", "doc_id", "text/plain").cache()


def test_as_media_schema(media):
    assert [f.name for f in media.schema] == ["media_id", "content", "mime", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"


def test_binary_meta_jvm_side(media, spark):
    out = multimodal.binary_meta(media)
    rows = {r["media_id"]: r for r in out.collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF, "documents").limit(50).collect()}
    import hashlib

    for doc_id, text in docs.items():
        assert rows[doc_id]["n_bytes"] == len(text.encode())
        assert rows[doc_id]["checksum"] == hashlib.md5(text.encode()).hexdigest()
        assert rows[doc_id]["mime"] == "text/plain"


def test_decode_images_fake_kernel(media):
    out = multimodal.decode_images(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["checksum"]) == 32
        assert 16 <= r["width"] <= 271 and 16 <= r["height"] <= 271
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_decode_images_deterministic(media):
    a = {(r["media_id"], tuple(r["features"])) for r in multimodal.decode_images(media, fake=True).collect()}
    b = {(r["media_id"], tuple(r["features"])) for r in multimodal.decode_images(media, fake=True).collect()}
    assert a == b


def test_decode_images_unsupported_format_gated(media):
    # compressed/unknown formats must fail loudly, not silently fake
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.decode_images(media, fake=False).collect()


def _ppm_bytes(width: int, height: int, pixels: bytes) -> bytes:
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def _bmp_bytes(width: int, height: int, rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal 24bpp bottom-up BMP writer (pure test helper)."""
    import struct

    stride = (width * 3 + 3) & ~3
    pixel_data = bytearray()
    for row in reversed(rows_rgb):  # bottom-up
        for r, g, b in row:
            pixel_data += bytes([b, g, r])
        pixel_data += b"\x00" * (stride - width * 3)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    return header + dib + bytes(pixel_data)


def test_decode_images_real_ppm(spark):
    # 2x1 image: red pixel then pixel (10, 20, 30)
    content = _ppm_bytes(2, 1, bytes([255, 0, 0, 10, 20, 30]))
    df = spark.createDataFrame([(1, content, "image/x-portable-pixmap", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.decode_images(df, fake=False).collect()
    assert (row["width"], row["height"]) == (2, 1)
    feats = row["features"]
    assert feats[0] == pytest.approx((255 + 10) / 2)  # mean R
    assert feats[1] == pytest.approx((0 + 20) / 2)  # mean G
    assert feats[2] == pytest.approx((0 + 30) / 2)  # mean B


def test_decode_images_real_ppm_with_comment(spark):
    content = b"P6\n# a comment\n1 1\n255\n" + bytes([7, 8, 9])
    df = spark.createDataFrame([(1, content, "image/x-portable-pixmap", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.decode_images(df, fake=False).collect()
    assert (row["width"], row["height"]) == (1, 1)
    assert row["features"][:3] == [7.0, 8.0, 9.0]


def test_decode_images_real_bmp(spark):
    # 3x2 BMP exercises row padding (3*3=9 bytes -> stride 12) + bottom-up order
    rows_rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    content = _bmp_bytes(3, 2, rows_rgb)
    df = spark.createDataFrame([(1, content, "image/bmp", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.decode_images(df, fake=False).collect()
    assert (row["width"], row["height"]) == (3, 2)
    flat = [c for r in rows_rgb for px in r for c in px]
    assert row["features"][0] == pytest.approx(sum(flat[0::3]) / 6)  # mean R
    assert row["features"][1] == pytest.approx(sum(flat[1::3]) / 6)  # mean G
    assert row["features"][2] == pytest.approx(sum(flat[2::3]) / 6)  # mean B


def test_resize_images_real_nn_upsample(spark):
    """2x2 -> 3x3 nearest neighbor: index map (i*2)//3 = [0,0,1], so the
    source pixels weight 4/2/2/1 into the resized means."""
    p = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    content = _ppm_bytes(2, 2, bytes([c for px in p for c in px]))
    df = spark.createDataFrame([(1, content, "image/x-portable-pixmap", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.resize_images(df, dst_w=3, dst_h=3, fake=False).collect()
    assert (row["src_width"], row["src_height"]) == (2, 2)
    assert (row["width"], row["height"]) == (3, 3)
    for c, name in enumerate(["mean_r", "mean_g", "mean_b"]):
        expected = (4 * p[0][c] + 2 * p[1][c] + 2 * p[2][c] + p[3][c]) / 9
        assert row[name] == expected


def test_resize_images_real_downsample_bmp(spark):
    """4x2 BMP -> 2x1: NN picks rows [0], cols [0, 2]."""
    rows_rgb = [
        [(8, 0, 0), (16, 0, 0), (24, 0, 0), (32, 0, 0)],
        [(99, 99, 99), (99, 99, 99), (99, 99, 99), (99, 99, 99)],
    ]
    content = _bmp_bytes(4, 2, rows_rgb)
    df = spark.createDataFrame([(1, content, "image/bmp", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.resize_images(df, dst_w=2, dst_h=1, fake=False).collect()
    assert (row["width"], row["height"]) == (2, 1)
    assert row["mean_r"] == (8 + 24) / 2 and row["mean_g"] == 0.0


def test_resize_images_null_and_unsupported(spark):
    df = spark.createDataFrame([(1, None, "image/png", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.resize_images(df, fake=False).collect()
    assert row["width"] is None
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(1, b"\x89PNG....", "image/png", None)], multimodal.MEDIA_SCHEMA
    )
    with _pytest.raises(Exception, match="codec|NotImplemented"):
        multimodal.resize_images(bad, fake=False).collect()


def test_null_payload_rows_survive(spark):
    df = spark.createDataFrame([(1, None, "image/png", None)], multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_images(df, fake=True).collect()
    assert len(out) == 1 and out[0]["n_bytes"] is None


def test_frame_sampling_fake(media):
    frames = multimodal.sample_video_frames(media.limit(3), every_n=64, fake=True)
    rows = frames.collect()
    assert len(rows) > 3  # multiple frames per payload
    by_media: dict[int, list[int]] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame indices


def test_frame_sampling_unsupported_format_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.sample_video_frames(media.limit(1), fake=False).collect()


def _y4m_bytes(width: int, height: int, n_frames: int) -> bytes:
    """Minimal C420 Y4M writer; frame k is filled with byte value k."""
    frame_size = width * height * 3 // 2
    out = f"YUV4MPEG2 W{width} H{height} F30:1 Ip A1:1 C420\n".encode()
    for k in range(n_frames):
        out += b"FRAME\n" + bytes([k]) * frame_size
    return out


def test_frame_sampling_real_y4m(spark):
    content = _y4m_bytes(4, 4, 10)
    df = spark.createDataFrame([(1, content, "video/x-y4m", None)], multimodal.MEDIA_SCHEMA)
    rows = multimodal.sample_video_frames(df, every_n=3, fake=False).collect()
    # frames 0, 3, 6, 9 sampled, re-indexed 0..3
    assert [(r["frame_idx"], bytes(r["frame"])[0]) for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        (0, 0),
        (1, 3),
        (2, 6),
        (3, 9),
    ]
    frame_size = 4 * 4 * 3 // 2
    assert all(len(bytes(r["frame"])) == frame_size for r in rows)
    assert all(len(set(bytes(r["frame"]))) == 1 for r in rows)  # constant fill survives


def test_parse_y4m_c444_and_errors():
    from mssql2monetdb_spark.operators.multimodal import _parse_y4m

    c444 = b"YUV4MPEG2 W2 H2 C444\n" + b"FRAME\n" + bytes(range(12))
    w, h, frames = _parse_y4m(c444)
    assert (w, h) == (2, 2) and frames == [bytes(range(12))]
    with pytest.raises(ValueError, match="FRAME"):
        _parse_y4m(b"YUV4MPEG2 W2 H2 C444\n" + b"JUNK!\n" + bytes(12))


def test_audio_features_fake(media):
    out = multimodal.extract_audio_features(media, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert r["duration_est_s"] > 0
        assert len(r["mfcc_like"]) == multimodal.FEATURE_DIM
        assert all(-1.0 <= f <= 1.0 for f in r["mfcc_like"])


def test_audio_features_unsupported_format_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_audio_features(media, fake=False).collect()


def _wav_bytes(samples: list[int], sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal PCM WAV writer (pure test helper)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_features_real_wav(spark):
    samples = [0] * 8000 + [16384] * 8000  # 1 second at 16 kHz: silence then half amplitude
    content = _wav_bytes(samples)
    df = spark.createDataFrame([(1, content, "audio/wav", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.extract_audio_features(df, fake=False).collect()
    assert row["duration_est_s"] == pytest.approx(1.0)
    feats = row["mfcc_like"]
    assert len(feats) == multimodal.FEATURE_DIM
    # first half silent, second half RMS = 16384/32768 = 0.5
    assert all(f == pytest.approx(0.0) for f in feats[:4])
    assert all(f == pytest.approx(0.5) for f in feats[4:])


def test_audio_features_real_wav_stereo(spark):
    # stereo: L=1000, R=3000 -> mono mean 2000
    interleaved = [1000, 3000] * 800
    content = _wav_bytes(interleaved, sample_rate=8000, channels=2)
    df = spark.createDataFrame([(1, content, "audio/wav", None)], multimodal.MEDIA_SCHEMA)
    [row] = multimodal.extract_audio_features(df, fake=False).collect()
    assert row["duration_est_s"] == pytest.approx(800 / 8000)
    assert all(f == pytest.approx(2000 / 32768.0) for f in row["mfcc_like"])


def test_byte_histogram_arrow_matches_reference(media, spark):
    """mapInArrow nibble histogram equals a pure-Python reference for every
    payload, sums to the byte length, and nulls pass through."""
    out = {r["media_id"]: r["nibble_hist"] for r in multimodal.byte_histogram_arrow(media).collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF, "documents").limit(50).collect()}
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        raw = text.encode()
        ref = [0] * 16
        for b in raw:
            ref[b >> 4] += 1
        assert out[doc_id] == ref
        assert sum(out[doc_id]) == len(raw)
