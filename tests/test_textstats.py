"""Text-analysis functions: token counts, quality, lang-id, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.functions.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    text_stats,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("one",)], "t string")
    out = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 1]


def test_stopword_ratio_and_quality(spark):
    df = spark.createDataFrame([("the cat and the dog of war",)], "t string")
    r = df.select(
        stopword_ratio(F.col("t")).alias("sw"), quality_score(F.col("t")).alias("q")
    ).first()
    # the(2) + and(1) + of(1) = 4 markers / 7 tokens
    assert r["sw"] == pytest.approx(4 / 7)
    assert 0.0 <= r["q"] <= 1.0


def test_lang_id(spark):
    rows = [
        ("the cat and the dog went to the park",),
        ("der hund und die katze ist gut",),
        ("le chat et la mer les montagnes des arbres",),
        ("xyzzy plugh qwerty",),
    ]
    df = spark.createDataFrame(rows, "t string")
    out = [r["l"] for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint_stability(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = base + " appended tail words here"  # min-window usually unchanged
    df = spark.createDataFrame([(1, base), (2, base), (3, "totally other text stream")],
                               "doc_id bigint, text string")
    fp = {r["id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp["1"] == fp["2"]
    assert fp["1"] != fp["3"]
    assert len(fp["1"]) == 32  # md5 hex


def test_text_stats_shape(spark):
    df = spark.createDataFrame([(1, "the quick brown fox, it jumps!")], "doc_id bigint, text string")
    row = text_stats(df).first()
    assert row["n_tokens"] == 6
    assert row["n_units"] == 8  # 6 tokens + ',' + '!'
    assert row["lang_pred"] == "en"
