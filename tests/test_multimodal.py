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
