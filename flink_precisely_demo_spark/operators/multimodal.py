"""Multimodal column operators (SURVEY.md §2.3).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct — the lakehouse-native layout for multimodal training
data (payload bytes stay columnar; metadata prunes without touching
bytes). The Spark-side plumbing here — schemas, partitioning, Arrow
batch shapes, UDF signatures — is real and tested. Codecs that need
no external library decode FOR REAL: WAV/PCM16 (stdlib ``wave`` +
numpy), uncompressed 24-bit BMP and binary PPM (pure numpy).
Compressed formats (jpeg/png/mp3/...) are STUBBED with deterministic
fakes because their libraries are not in this container; each stub
is marked ``# STUB:`` inside a `_decode_*` function whose body is
the only thing a real deployment replaces (PIL / torchaudio / pyav),
keeping batch shapes and schemas unchanged.

Scale notes:
- decode/feature work is embarrassingly parallel: ``mapInPandas``
  over row groups; repartition by id first so one giant file's rows
  fan out (same rule as dedup._fan_out).
- Arrow moves the binary payloads zero-copy into the Python worker;
  the returned feature arrays are small, so the expensive direction
  (bytes in) never crosses twice.
- ``spark.read.format("binaryFile")`` ingests raw media directories
  into this layout (path, modificationTime, length, content).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("meta", MEDIA_META),
    T.StructField("payload", T.BinaryType()),
])


def ingest_binary_dir(spark, path: str) -> DataFrame:
    """Raw media directory -> (media_id, meta, payload) rows via the
    binaryFile source. Metadata is inferred from the file suffix only
    (full probe happens at decode time)."""
    raw = spark.read.format("binaryFile").load(path)
    fmt = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = (F.when(fmt.isin("png", "jpg", "jpeg", "gif", "bmp",
                                  "ppm", "pnm"), "image")
                   .when(fmt.isin("wav", "mp3", "flac"), "audio")
                   .when(fmt.isin("mp4", "avi", "mkv"), "video")
                   .otherwise("unknown"))
    meta = F.struct(
        media_type.alias("media_type"), fmt.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_channels"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"))
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        meta.alias("meta"),
        F.col("content").alias("payload"))


# --------------------------------------------------------------- codecs
#
# WAV/PCM16, BMP and PPM are decoded FOR REAL (stdlib `wave` + pure
# numpy — no external media libraries needed). Compressed formats
# (jpeg/png/mp3/...) keep deterministic fakes marked `# STUB:` —
# those codecs need libraries this container doesn't have; a real
# deployment swaps only the stub bodies (PIL / soundfile / pyav),
# batch shapes and schemas unchanged.

def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) RGB
    uint8. Pure numpy: header fields are little-endian at fixed
    offsets; rows are 4-byte padded, BGR, bottom-up (negative height
    = top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp}, "
                         f"compression={comp})")
    top_down, h = h < 0, abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[..., ::-1].copy()  # BGR -> RGB


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) RGB uint8. Pure numpy; handles
    whitespace/comment-tolerant headers."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=pos)
    return arr.reshape(h, w, 3).copy()


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """(h, w, 3) uint8 RGB. BMP/PPM decode for real; compressed
    formats fall through to the stub."""
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt in ("ppm", "pnm"):
        return _decode_ppm(payload)
    # STUB: jpeg/png/gif need an image library (PIL in production:
    # np.asarray(PIL.Image.open(io.BytesIO(payload)))). The fake
    # derives a (h, w, 3) uint8 array from the payload bytes so that
    # every downstream shape/statistic is exercised genuinely.
    h = 8 + payload[0] % 8 if payload else 8
    w = 8 + payload[1] % 8 if len(payload) > 1 else 8
    arr = np.frombuffer(
        (payload * ((h * w * 3) // max(len(payload), 1) + 1))[: h * w * 3],
        dtype=np.uint8)
    return arr.reshape(h, w, 3)


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAV PCM16 -> (mono float32 samples in [-1, 1], rate).
    stdlib `wave` + numpy; multi-channel is mean-mixed to mono."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nch = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float32)
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples / 32768.0, rate


def _decode_audio(payload: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """(mono float32 samples in [-1,1], sample_rate). WAV decodes for
    real; compressed audio falls through to the stub."""
    if fmt == "wav":
        return _decode_wav(payload)
    # STUB: mp3/flac need an audio library (soundfile/torchaudio in
    # production). Deterministic fake PCM derived from the bytes.
    samples = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
               - 127.5) / 127.5
    return samples, 16_000


# ------------------------------------------------------------ operators

IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int, "
                         "n_channels int, mean_luma double, payload_bytes long")


def image_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract images: (media_id, width, height,
    n_channels, mean_luma, payload_bytes)."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, meta, payload in zip(pdf["media_id"], pdf["meta"],
                                          pdf["payload"]):
                arr = _decode_image(bytes(payload), meta["format"])
                luma = (0.2126 * arr[..., 0] + 0.7152 * arr[..., 1]
                        + 0.0722 * arr[..., 2])
                out.append((mid, arr.shape[1], arr.shape[0], arr.shape[2],
                            round(float(luma.mean()), 6), len(payload)))
            yield pd.DataFrame(out, columns=[
                "media_id", "width", "height", "n_channels",
                "mean_luma", "payload_bytes"])

    return (media.filter(F.col("meta.media_type") == "image")
                 .repartition(n, "media_id")
                 .mapInPandas(compute, schema=IMAGE_FEATURES_SCHEMA))


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize (nearest-neighbor on the fake decode) and re-emit as
    binary rows — shape (media_id, meta, payload) is preserved so
    resize composes with any other media operator."""
    n = media.sparkSession.sparkContext.defaultParallelism

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, payloads = [], []
            for meta, payload in zip(pdf["meta"], pdf["payload"]):
                arr = _decode_image(bytes(payload), meta["format"])
                ys = (np.arange(out_h) * arr.shape[0] // out_h)
                xs = (np.arange(out_w) * arr.shape[1] // out_w)
                resized = arr[ys][:, xs]
                m = dict(meta)
                m.update(width=out_w, height=out_h, n_channels=3)
                metas.append(m)
                payloads.append(resized.tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "meta": metas,
                "payload": payloads})

    return (media.filter(F.col("meta.media_type") == "image")
                 .repartition(n, "media_id")
                 .mapInPandas(compute, schema=MEDIA_SCHEMA))


AUDIO_FEATURES_SCHEMA = ("media_id long, n_samples long, sample_rate int, "
                         "rms double, duration_ms long")


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio: RMS energy and duration."""
    n = media.sparkSession.sparkContext.defaultParallelism

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, meta, payload in zip(pdf["media_id"], pdf["meta"],
                                          pdf["payload"]):
                samples, rate = _decode_audio(bytes(payload), meta["format"])
                rms = float(np.sqrt((samples ** 2).mean())) if len(samples) else 0.0
                out.append((mid, len(samples), rate, round(rms, 6),
                            int(len(samples) * 1000 / rate)))
            yield pd.DataFrame(out, columns=[
                "media_id", "n_samples", "sample_rate", "rms", "duration_ms"])

    return (media.filter(F.col("meta.media_type") == "audio")
                 .repartition(n, "media_id")
                 .mapInPandas(compute, schema=AUDIO_FEATURES_SCHEMA))


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> sampled frame rows (media_id, frame_idx, ts_ms, frame
    as binary). # STUB: frames are fixed-stride byte slices of the
    payload standing in for real demuxed frames (pyav in production);
    the explode shape (one row per sampled frame) is the real part."""
    n = media.sparkSession.sparkContext.defaultParallelism
    schema = "media_id long, frame_idx int, ts_ms long, frame binary"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // 256, 1)
                for i in range(0, n_frames, max(every_ms // 40, 1)):
                    out.append((mid, i, i * 40,
                                b[i * 256:(i + 1) * 256] or b"\x00"))
            yield pd.DataFrame(out, columns=[
                "media_id", "frame_idx", "ts_ms", "frame"])

    return (media.filter(F.col("meta.media_type") == "video")
                 .repartition(n, "media_id")
                 .mapInPandas(compute, schema=schema))


def binary_manifest(media: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """(id, content_md5, byte_len): content addressing of binary
    payloads — the manifest every multimodal pipeline builds first
    (dedup by content id, storage accounting, cache keys). Pure
    JVM-side column expressions over the binary column; at 100 TB
    this runs inside the scan stage with zero shuffle, and the
    16-byte digest — not the payload — is what any downstream
    grouping shuffles."""
    return media.select(
        F.col(id_col),
        F.md5(F.col(payload_col)).alias("content_md5"),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"))
