"""Multimodal binary-column plumbing (decode stubbed, shape real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.multimodal import FEATURE_DIM, extract_features, frame_sample, synth_media


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_feature_extraction_shape(media):
    out = extract_features(media, decode_stub=True)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])


def test_feature_extraction_deterministic(media):
    a = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert a == b


def test_decode_stub_contract(media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, decode_stub=False).collect()


@pytest.fixture(scope="module")
def real_media(spark):
    return synth_media(spark, n=30, real_codecs=True).cache()


def test_ppm_roundtrip_and_resize():
    import numpy as np

    from mix_blink_spark.multimodal import decode_ppm, encode_ppm, resize_nearest

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (10, 14, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # header variants: comments + extra whitespace
    hdr = b"P6\n# a comment\n 14\t10 \n255\n" + img.tobytes()
    assert (decode_ppm(hdr) == img).all()
    small = resize_nearest(img, (5, 7))
    assert small.shape == (5, 7, 3)
    assert small.dtype == np.uint8
    with pytest.raises(NotImplementedError, match="PPM/P6"):
        decode_ppm(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_image_features_real_decode(real_media):
    from mix_blink_spark.multimodal import image_features

    out = {r["media_id"]: r for r in image_features(real_media, size=(8, 8)).collect()}
    assert len(out) == 10  # every 3rd of 30 is an image
    for r in out.values():
        assert len(r["features"]) == 8 * 8 * 3
        assert all(0.0 <= x <= 1.0 for x in r["features"])
        assert r["width"] >= 8 and r["height"] >= 8


def test_video_frames_real_decode(real_media, spark):
    from mix_blink_spark.multimodal import video_frames

    rows = video_frames(real_media, every_nth=2).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for rid, frames in by_id.items():
        # frames 0, 2, 4, ... sampled
        assert [f["frame_no"] for f in sorted(frames, key=lambda x: x["frame_no"])] == list(
            range(0, 2 * len(frames), 2)
        )
        for f in frames:
            assert f["width"] == 12 and f["height"] == 8
            assert len(f["mean_rgb"]) == 3
            # constant-color synthetic frames: channel means all equal
            assert max(f["mean_rgb"]) - min(f["mean_rgb"]) < 1e-6


def test_frame_sample_plumbing(media):
    frames = frame_sample(media, every_n_bytes=512, frame_len=32)
    rows = frames.collect()
    assert rows, "video rows expected"
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    sizes = media.filter(F.col("media_type") == "video").select(
        "media_id", F.length("payload").alias("n")
    ).collect()
    for s in sizes:
        expected = (s["n"] - 1) // 512 + 1
        assert len(by_id[s["media_id"]]) == expected
    assert all(len(r["frame_bytes"]) <= 32 for r in rows)
