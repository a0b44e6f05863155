"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import multimodal as M


def test_feature_extraction_schema_and_determinism(spark):
    media = M.synth_media(spark, 30)
    out = M.extract_features(media, dim=8)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    assert out.columns == ["doc_id", "media_type", "n_bytes", "feature"]
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in rows if r["n_bytes"] > 0)
    rows2 = sorted(M.extract_features(media, dim=8).collect(), key=lambda r: r["doc_id"])
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]


def test_strict_mode_marks_decoder_boundary(spark):
    media = M.synth_media(spark, 3)
    with pytest.raises(NotImplementedError):
        M.extract_features(media, strict=True)


def test_frame_sampling_fanout(spark):
    media = M.synth_media(spark, 30)
    frames = M.sample_frames(media, every_ms=1000)
    per_doc = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    videos = {r["doc_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert set(per_doc) == videos
    assert all(n == 4 for n in per_doc.values())  # 4000ms / 1000ms


def test_null_media_safe(spark):
    df = spark.createDataFrame(
        [(1, None, "image", None, None, None)], M.MEDIA_SCHEMA
    )
    out = M.extract_features(df).collect()
    assert out[0]["n_bytes"] == 0 and out[0]["feature"] == [0.0] * 8
