from __future__ import annotations

import pytest

from cloud_native_reddit_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_frame,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_extract_features_shape_and_determinism(spark):
    media = synthetic_media(spark, 32)
    f1 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert len(f1) == 32
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert f1 == f2  # deterministic stub


def test_frame_sample_counts(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000)
    per_video = {}
    for r in frames.collect():
        per_video[r["media_id"]] = per_video.get(r["media_id"], 0) + 1
    videos = {r["media_id"]: r["duration_ms"] for r in media.filter("modality = 'video'").collect()}
    assert set(per_video) == set(videos)
    for mid, dur in videos.items():
        assert per_video[mid] == (dur + 999) // 1000


def test_decode_frame_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_frame(b"x", 0)
