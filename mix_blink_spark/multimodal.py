"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec step is STUBBED because
this container has no image/audio libraries. ``decode_stub=True`` swaps in
a deterministic fake decoder (byte-hash features) so the pipeline shape is
testable end-to-end; with ``decode_stub=False`` the decode raises
``NotImplementedError`` exactly where a real libjpeg/ffmpeg call belongs.

Schema:
    media: media_id string, media_type string ('image'|'audio'|'video'),
           payload binary, meta struct<width:int, height:int, duration_ms:int>
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int>"
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature extractor."""
    h = blake2b(payload, digest_size=dim * 4, key=b"mbs-media").digest()
    arr = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    return (arr / np.float64(2**32)).astype(np.float32)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """payload -> features array<float> via mapInPandas (Arrow batches).

    A real implementation decodes (PIL/ffmpeg) inside the same iterator —
    worker-local codec init happens once per task, batches stream through.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "media decode requires image/audio libs not present in this container"
                )
            feats = [
                _fake_features(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        compute, schema="media_id string, media_type string, features array<float>"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 1024, frame_len: int = 64) -> DataFrame:
    """Video 'frame sampling' plumbing: slice the payload every N bytes.

    Real frame decoding is the stubbed part; the explode/partitioning shape
    (one row per sampled frame, co-partitioned by media_id) is the part that
    matters at scale and is exercised here with byte slices.
    """
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest((F.length("payload") - 1) / every_n_bytes, F.lit(0)).cast("int"),
        )
    ).alias("frame_no")
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload", idx)
        .select(
            "media_id",
            "frame_no",
            F.expr(f"substring(payload, frame_no * {every_n_bytes} + 1, {frame_len})").alias(
                "frame_bytes"
            ),
        )
    )


def synth_media(spark, n: int = 50, seed: int = 99) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(512, 4096)))
        meta = (
            (640, 480, None)
            if mtype == "image"
            else (None, None, rng.randrange(1000, 60000))
        )
        rows.append((f"m{i:04d}", mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
