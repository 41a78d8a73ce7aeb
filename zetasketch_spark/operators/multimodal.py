"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side shape is real and tested — schema, partition-preserving
``mapInPandas``, Arrow batch flow, feature extraction over binary payloads.
The codec step is STUBBED (this container ships no image/audio libraries):
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which derives a fake-but-deterministic
"decoded" feature block from the payload bytes so the downstream plumbing
(batching, shapes, joins) is exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("payload", BinaryType()),
])


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads with metadata)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append((i, str(kind),
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[str(kind)],
                     int(rng.integers(16, 512)), int(rng.integers(16, 512)),
                     int(rng.integers(100, 60000)), payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/ffmpeg (absent in this container)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg which are not available in "
            "this environment; pass deterministic_fake=True for plumbing tests")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return np.tile(h, (8, 1)).astype(np.float64)  # fake 8x64 'pixel' block


def resize_image(block: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded block (the real thing would be
    PIL/opencv; the geometry/plumbing here is what the pipeline tests)."""
    h, w = block.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return block[ys][:, xs]


def sample_frames(payload: bytes, duration_ms: int, every_ms: int = 1000,
                  deterministic_fake: bool = False) -> list[np.ndarray]:
    """STUB: video frame sampling. Real decode needs ffmpeg (absent);
    the deterministic fake derives one block per sampled timestamp so the
    batch shapes downstream are real."""
    if not deterministic_fake:
        raise NotImplementedError(
            "video decode requires ffmpeg which is not available in this "
            "environment; pass deterministic_fake=True for plumbing tests")
    n = max(1, duration_ms // every_ms)
    return [decode_image(payload[i:] + payload[:i], deterministic_fake=True)
            for i in range(min(n, 8))]


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("mean_val", DoubleType()),
    StructField("feature_dim", IntegerType()),
])


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    ``mapInPandas`` (the real Arrow batch shape a decode stage would use)."""

    def fn(batches):
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                block = decode_image(bytes(row["payload"]),
                                     deterministic_fake=deterministic_fake)
                feats.append((row["media_id"], row["kind"],
                              len(row["payload"]),
                              float(np.round(block.mean(), 6)),
                              int(block.size)))
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, FEATURE_SCHEMA)
