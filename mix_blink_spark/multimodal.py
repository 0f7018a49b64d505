"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Decode is REAL for formats that need no
external library: PPM/P6 images (``decode_ppm``, pure numpy) and
MJPPM-style video (concatenated P6 frames, ``video_frames``). Compressed
codecs (JPEG/PNG/ffmpeg audio) raise ``NotImplementedError`` exactly where
a libjpeg/ffmpeg call belongs — this container has no media libraries —
and the deterministic byte-hash fake (``decode_stub=True``) remains for
shape-only tests.

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


# ---------------------------------------------------------------------------
# pure-numpy codecs (no external libs)


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, raster_offset) of a binary PPM (P6) header —
    comments and arbitrary whitespace per the netpbm spec."""
    if payload[:2] != b"P6":
        raise NotImplementedError(
            f"unsupported image codec (magic {payload[:2]!r}) — only PPM/P6 "
            "decodes without external libraries; plug PIL/libjpeg in here"
        )
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    return w, h, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 (pure numpy)."""
    w, h, off = _parse_ppm_header(payload)
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    return raster.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6); test-fixture inverse of decode."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (out_h, out_w) — pure index sampling."""
    out_h, out_w = size
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(int).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(int).clip(0, w - 1)
    return arr[ys][:, xs]

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


def image_features(media: DataFrame, size: tuple[int, int] = (8, 8)) -> DataFrame:
    """REAL image path: decode PPM → nearest-neighbor resize to ``size`` →
    per-channel-normalized flattened features. One ``mapInPandas`` pass;
    decode/resize run inside the iterator so a real codec init (PIL etc.)
    would happen once per task. Output: (media_id, width, height,
    features array<float> of len size[0]*size[1]*3)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_ppm(bytes(payload))
                small = resize_nearest(img, size)
                feats = (small.astype(np.float32) / 255.0).reshape(-1)
                rows.append((mid, img.shape[1], img.shape[0], feats.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "features"])

    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            compute,
            schema="media_id string, width int, height int, features array<float>",
        )
    )


def video_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL video path for MJPPM payloads (concatenated P6 frames): decode
    the stream, keep every ``every_nth`` frame, emit one row per sampled
    frame with its decoded dimensions and a mean-color feature. The
    explode shape (one row per frame, co-partitioned by media_id) is the
    scale-relevant part; a real container format swaps the splitter."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                pos, frame_no = 0, 0
                while pos < len(buf):
                    w, h, off = _parse_ppm_header(buf[pos:])
                    img = decode_ppm(buf[pos:])
                    pos += off + w * h * 3
                    if frame_no % every_nth == 0:
                        mean_rgb = img.reshape(-1, 3).mean(axis=0) / 255.0
                        rows.append((mid, frame_no, w, h, [float(x) for x in mean_rgb]))
                    frame_no += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "width", "height", "mean_rgb"]
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            compute,
            schema=(
                "media_id string, frame_no int, width int, height int, "
                "mean_rgb array<float>"
            ),
        )
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


def synth_media(spark, n: int = 50, seed: int = 99, real_codecs: bool = False) -> DataFrame:
    """Deterministic media table for tests. ``real_codecs=True`` emits
    decodable payloads: PPM images and MJPPM (concatenated-P6) videos —
    audio stays opaque bytes (no lib-free audio codec)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        if real_codecs and mtype == "image":
            w, h = rng.randrange(8, 33), rng.randrange(8, 33)
            arr = np.array(
                [[((x * 7 + y * 13 + i) % 256) for x in range(w)] for y in range(h)],
                dtype=np.uint8,
            )
            payload = encode_ppm(np.stack([arr, arr // 2, 255 - arr], axis=-1))
            meta = (w, h, None)
        elif real_codecs and mtype == "video":
            w, h = 12, 8
            frames = []
            for f in range(rng.randrange(3, 9)):
                arr = np.full((h, w, 3), (f * 31 + i) % 256, dtype=np.uint8)
                frames.append(encode_ppm(arr))
            payload = b"".join(frames)
            meta = (w, h, len(frames) * 40)
        else:
            payload = bytes(rng.randrange(256) for _ in range(rng.randrange(512, 4096)))
            meta = (
                (640, 480, None)
                if mtype == "image"
                else (None, None, rng.randrange(1000, 60000))
            )
        rows.append((f"m{i:04d}", mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
