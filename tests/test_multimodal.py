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


def test_decode_images_real_kernel_gated(media):
    # real decode must fail loudly, not silently fake
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        multimodal.decode_images(media, fake=False).collect()


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


def test_frame_sampling_real_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.sample_video_frames(media.limit(1), fake=False).collect()


def test_audio_features_fake(media):
    out = multimodal.extract_audio_features(media, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert r["duration_est_s"] > 0
        assert len(r["mfcc_like"]) == multimodal.FEATURE_DIM
        assert all(-1.0 <= f <= 1.0 for f in r["mfcc_like"])


def test_audio_features_real_gated(media):
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_audio_features(media, fake=False).collect()
