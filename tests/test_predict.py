"""blink_eval / predict path parity over the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.plans.predict import evaluate, predict


@pytest.fixture(scope="module")
def inputs(corpus):
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")
    return pages, spans, ents, golds


def test_predict_payload_shape(spark, inputs):
    pages, spans, ents, golds = inputs
    out = predict(spark, pages, spans, ents, top_k=5)
    rows = out.collect()
    assert rows
    per_mention = {}
    for r in rows:
        per_mention.setdefault(r["rid"], []).append(r)
    for rid, hits in per_mention.items():
        ranks = sorted(h["rank"] for h in hits)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(hits) <= 5
    # 4-dp rounding + description truncation (predict.py:46-47)
    assert all(round(r["similarity"], 4) == r["similarity"] for r in rows)
    assert all(r["description"] is None or len(r["description"]) <= 300 for r in rows)


def test_predict_top1_accuracy_on_variants(spark, inputs):
    """Mentions whose surface is a name/case/typo variant must rank their
    gold entity first; code-name aliases match exactly through the
    dictionary's alias surfaces."""
    pages, spans, ents, golds = inputs
    out = predict(spark, pages, spans, ents, top_k=1)
    g = golds.select(F.col("mention_id").alias("rid"), "labels")
    top1 = out.filter(F.col("rank") == 1).join(g, "rid")
    judged = top1.filter(~F.array_contains("labels", "-1") | (F.size("labels") > 1))
    n = judged.count()
    correct = judged.filter(F.array_contains("labels", F.col("id"))).count()
    assert n > 0
    assert correct / n >= 0.97, f"top-1 accuracy {correct}/{n}"


def test_entity_index_encodes_on_executors(spark, inputs, monkeypatch):
    """The index build must run the encoder as a Spark job (the pandas_udf
    seam) and collect only finished vectors — never call the encoder in the
    driver process (round-3 verdict item 4: with 10^6 aliases and a real
    transformer, driver-side encoding serializes the whole build).

    Driver-side monkeypatches do NOT propagate to Python UDF workers
    (separate processes re-import the module), so poisoning the batch
    encoders here proves no driver call happens while leaving executor
    encoding intact."""
    import numpy as np

    import mix_blink_spark.functions.embed as embed
    from mix_blink_spark.functions.text import normalize_surface
    from mix_blink_spark.plans.predict import entity_index
    from mix_blink_spark.sources.dictionary import explode_surfaces, with_nil

    _, _, ents, _ = inputs
    # expected (id, norm) via pure column exprs — never touches the encoder
    expected_norms = sorted(
        (r["id"], r["norm"])
        for r in explode_surfaces(with_nil(ents))
        .select("id", normalize_surface(F.col("surface")).alias("norm"))
        .collect()
    )

    def _poison(*a, **k):
        raise AssertionError("encoder called in the driver process")

    monkeypatch.setattr(embed, "encode_matrix", _poison)
    monkeypatch.setattr(embed, "encode_one", _poison)
    mat, ids = entity_index(ents)
    monkeypatch.undo()

    assert ids == [i for i, _ in expected_norms]
    ref = embed.encode_matrix([n for _, n in expected_norms])
    np.testing.assert_allclose(mat, ref, rtol=0, atol=1e-6)


def test_evaluate_recall_metrics(spark, inputs):
    pages, spans, ents, golds = inputs
    m = evaluate(spark, pages, spans, ents, golds, k=100).first()
    assert 0 <= m["recall_1"] <= m["recall_10"] <= m["recall_50"] <= m["recall_100"] <= 1
    assert m["recall_10"] >= 0.8  # non-NIL variants retrievable
    assert 0 <= m["mrr"] <= 1
