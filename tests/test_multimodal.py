"""Multimodal plumbing tests: schemas, partitioning, Arrow batch
shapes, and operator composition — the decode stubs are deterministic
fakes (no media libs in the container), everything around them real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    frame_sample,
    image_features,
    image_resize,
    ingest_binary_dir,
)


@pytest.fixture()
def media(spark):
    rows = []
    for i in range(20):
        payload = bytes([(i * 37 + j) % 256 for j in range(512)])
        mt = ["image", "audio", "video"][i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[mt]
        rows.append((i, {"media_type": mt, "format": fmt, "width": None,
                         "height": None, "n_channels": None,
                         "sample_rate": None, "duration_ms": None}, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features(media):
    feats = image_features(media).collect()
    assert len(feats) == 7  # i % 3 == 0 -> images
    for r in feats:
        assert r["width"] >= 8 and r["height"] >= 8 and r["n_channels"] == 3
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert r["payload_bytes"] == 512
    # deterministic: same input -> same features
    again = image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_image_resize_composes(media):
    resized = image_resize(media, 4, 4)
    assert resized.schema == MEDIA_SCHEMA
    feats = image_features(resized).collect()
    assert len(feats) == 7
    for r in feats:
        # 4x4x3 uint8 payload after resize
        assert r["payload_bytes"] == 48


def test_audio_features(media):
    feats = audio_features(media).collect()
    assert len(feats) == 7
    for r in feats:
        assert r["n_samples"] == 512 and r["sample_rate"] == 16000
        assert 0.0 <= r["rms"] <= 1.0 and r["duration_ms"] == 32


def test_frame_sample(media):
    frames = frame_sample(media, every_ms=1000).collect()
    assert frames, "no frames sampled"
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
        assert isinstance(r["frame"], (bytes, bytearray)) and len(r["frame"]) > 0
    assert len(by_media) == 6  # 20 // 3 videos


def test_ingest_binary_dir(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.wav").write_bytes(b"RIFF fake")
    (tmp_path / "c.xyz").write_bytes(b"???")
    df = ingest_binary_dir(spark, str(tmp_path))
    got = {r["meta"]["format"]: r["meta"]["media_type"] for r in df.collect()}
    assert got == {"png": "image", "wav": "audio", "xyz": "unknown"}
    assert df.schema["payload"].dataType.typeName() == "binary"
