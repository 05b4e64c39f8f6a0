"""Multimodal tests: schemas, partitioning, Arrow batch shapes, and
operator composition. WAV/BMP/PPM decode for real (round-trip tests
on synthesized payloads below); compressed formats use the
deterministic stub fakes (no media libs in the container).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_precisely_demo_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_bmp,
    _decode_ppm,
    _decode_wav,
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
        # png/mp3 route to the deterministic stub decoders; real-codec
        # formats (wav/bmp/ppm) are exercised by the round-trip tests
        fmt = {"image": "png", "audio": "mp3", "video": "mp4"}[mt]
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


# ------------------------------------------------- real-codec round-trips

def _encode_wav(samples: np.ndarray, rate: int, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit uncompressed BMP: BGR rows, bottom-up, 4-byte padded."""
    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB->BGR
    pix = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 0, 0, 0, 0))
    return header + pix


def _encode_ppm(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = arr.shape
    hdr = b"P6\n" + (b"# synthetic test image\n" if comment else b"")
    return hdr + f"{w} {h}\n255\n".encode() + arr.tobytes()


def _test_img():
    # distinct values per row so a bottom-up/top-down mixup is caught
    return np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                     [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
                    dtype=np.uint8)


def test_bmp_decode_roundtrip():
    img = _test_img()
    assert np.array_equal(_decode_bmp(_encode_bmp(img)), img)


def test_ppm_decode_roundtrip():
    img = _test_img()
    assert np.array_equal(_decode_ppm(_encode_ppm(img)), img)
    assert np.array_equal(_decode_ppm(_encode_ppm(img, comment=True)), img)


def test_wav_decode_roundtrip():
    t = np.arange(2000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = _decode_wav(_encode_wav(sine, 8000))
    assert rate == 8000 and len(samples) == 2000
    assert np.allclose(samples, sine, atol=1e-4)
    # stereo mean-mixes to mono
    stereo = np.repeat(sine, 2)
    mixed, _ = _decode_wav(_encode_wav(stereo, 8000, nch=2))
    assert len(mixed) == 2000 and np.allclose(mixed, sine, atol=1e-4)


def test_wav_features_through_spark(spark):
    t = np.arange(2000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows = [(1, {"media_type": "audio", "format": "wav", "width": None,
                 "height": None, "n_channels": None, "sample_rate": None,
                 "duration_ms": None}, _encode_wav(sine, 8000))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (r,) = audio_features(media).collect()
    assert r["n_samples"] == 2000 and r["sample_rate"] == 8000
    assert r["duration_ms"] == 250
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 1e-3


def test_bmp_features_through_spark(spark):
    img = _test_img()
    rows = [(1, {"media_type": "image", "format": "bmp", "width": None,
                 "height": None, "n_channels": None, "sample_rate": None,
                 "duration_ms": None}, _encode_bmp(img))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    (r,) = image_features(media).collect()
    assert (r["width"], r["height"], r["n_channels"]) == (3, 2, 3)
    luma = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
            + 0.0722 * img[..., 2]).mean()
    assert abs(r["mean_luma"] - luma) < 1e-6
