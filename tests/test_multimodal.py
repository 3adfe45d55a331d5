"""Multimodal plumbing: binary payloads, mapInPandas batch shape, frame fan-out."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import multimodal as mm
from readwise_vector_db_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_fake_decode_deterministic():
    a = mm.fake_decode(b"hello world")
    b = mm.fake_decode(b"hello world")
    assert a.shape == (mm.FEATURE_DIM,)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, mm.fake_decode(b"other payload"))


def test_decode_stub_is_the_codec_boundary():
    with pytest.raises(NotImplementedError):
        mm.decode_stub(b"\x89PNG", "image/png")


def test_extract_features_schema_and_shape(spark):
    media = mm.media_from_documents(load_table(spark, SF_DIR, "documents"))
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert r["n_bytes"] > 0
        assert r["kind"] in ("image", "audio", "video")


def test_payload_roundtrip_md5(spark):
    media = mm.media_from_documents(load_table(spark, SF_DIR, "documents"))
    bad = (
        media.join(
            load_table(spark, SF_DIR, "documents"),
            media["media_id"] == F.col("doc_id"),
        )
        .filter(F.md5("payload") != F.md5(F.encode(F.col("text"), "UTF-8")))
        .count()
    )
    assert bad == 0


def test_sample_frames_fanout(spark):
    media = mm.media_from_documents(load_table(spark, SF_DIR, "documents"))
    frames = mm.sample_frames(media, every_ms=1000)
    got = {r["media_id"]: r["cnt"] for r in
           frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    meta = {r["media_id"]: r["d"] for r in
            media.filter(F.col("kind") == "video")
                 .select("media_id", F.col("meta.duration_ms").alias("d")).collect()}
    assert set(got) == set(meta)
    for mid, d in meta.items():
        assert got[mid] == (max(d - 1, 0)) // 1000 + 1


def test_resize_images_geometry_and_determinism(spark):
    media = mm.media_from_documents(load_table(spark, SF_DIR, "documents"))
    out = mm.resize_images(media, max_side=100).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert max(r["width"], r["height"]) <= 100
        assert r["payload"] is not None and len(r["payload"]) == 32  # sha256 stub
    # deterministic: same input → same payload bytes
    out2 = {r["media_id"]: bytes(r["payload"]) for r in
            mm.resize_images(media, max_side=100).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == out2


def test_resize_skips_null_payload(spark):
    rows = [
        (1, "image", b"img-bytes", ("image/png", 640, 480, None)),
        (2, "image", None, ("image/png", 640, 480, None)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_images(media, max_side=100).collect()
    assert [r["media_id"] for r in out] == [1]
