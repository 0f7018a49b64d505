"""Recall@K / MRR parity with reference evaluation/eval.py:17-59."""

from __future__ import annotations

import pytest

from mix_blink_spark.operators.metrics import best_ranks, cluster_pairs, pairwise_prf, recall_at_k


def test_best_rank_and_recall(spark):
    # m1: gold at ranks {3, 1} -> best 1; m2: gold at rank 12; m3: no gold in hits
    hits = spark.createDataFrame(
        [
            ("m1", "e1", 3), ("m1", "e2", 1), ("m1", "e9", 2),
            ("m2", "e5", 12), ("m2", "e9", 1),
            ("m3", "e9", 1),
        ],
        "rid string, hit_id string, rank int",
    )
    golds = spark.createDataFrame(
        [("m1", ["e1", "e2"]), ("m2", ["e5"]), ("m3", ["e7"])],
        "rid string, labels array<string>",
    )
    best = best_ranks(hits, golds)
    got = {r["rid"]: r["best_rank"] for r in best.collect()}
    assert got == {"m1": 1, "m2": 12, "m3": None}

    m = recall_at_k(best, ks=(1, 10, 50)).first()
    # R@1 = 1/3, R@10 = 1/3, R@50 = 2/3 (denominator = ALL mentions, eval.py:20)
    assert m["recall_1"] == pytest.approx(1 / 3)
    assert m["recall_10"] == pytest.approx(1 / 3)
    assert m["recall_50"] == pytest.approx(2 / 3)
    # MRR = (1/1 + 1/12 + 0) / 3 — misses count in denominator (eval.py:54-59)
    assert m["mrr"] == pytest.approx((1 + 1 / 12) / 3)


def test_pairwise_prf(spark):
    labeled = spark.createDataFrame(
        [("a", "b", True), ("a", "c", True), ("x", "y", False), ("b", "c", True)],
        "mention_a string, mention_b string, is_match boolean",
    )
    assignment = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")],
        "member string, cluster_id string",
    )
    pred = cluster_pairs(assignment)
    res = pairwise_prf(pred, labeled)
    # predicted: ab,ac,bc,xy -> tp=3, fp=1 (xy), fn=0
    assert res["tp"] == 3 and res["fp"] == 1 and res["fn"] == 0
    assert res["recall"] == 1.0
    assert res["precision"] == pytest.approx(0.75)
