"""Evaluation aggregations (SURVEY.md §2.6 A1/A2 + pairwise F1).

Recall@K / MRR reproduce the reference exactly
(mix_blink/evaluation/eval.py:17-59):

  - per mention, ``best_rank`` = the best (minimum) rank of ANY gold id in
    the top-k hit list (eval.py:24-42);
  - R@K = |mentions with best_rank ≤ K| / |all mentions| for K ∈
    {1, 10, 50, 100} (eval.py:45-52);
  - MRR = Σ 1/best_rank / |all mentions| — misses contribute 0 and the
    denominator includes them (eval.py:42,54-59).

Pairwise precision/recall/F1 vs labeled pairs is the north_rule's headline
metric (F1 ≥ 0.99): a predicted-positive pair is two mentions assigned the
same cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_ranks(hits: DataFrame, golds: DataFrame, id_col: str = "rid") -> DataFrame:
    """(rid, best_rank) — null best_rank when no gold appears in the hits.

    ``hits``: (rid, hit_id, rank); ``golds``: (rid, labels array<string>).
    Starts from golds so mentions with zero hits still appear (they count
    in the denominator, eval.py:20 ``true += 1``).
    """
    matched = hits.join(golds.select(id_col, "labels"), id_col).filter(
        F.array_contains(F.col("labels"), F.col("hit_id"))
    )
    br = matched.groupBy(id_col).agg(F.min("rank").alias("best_rank"))
    return golds.select(id_col).distinct().join(br, id_col, "left")


def recall_at_k(best: DataFrame, ks: tuple[int, ...] = (1, 10, 50, 100), id_col: str = "rid") -> DataFrame:
    """One-row DataFrame: recall_1, recall_10, ..., mrr (reference formulas)."""
    aggs = [
        (F.sum(F.when(F.col("best_rank") <= k, 1).otherwise(0)) / F.count(id_col)).alias(f"recall_{k}")
        for k in ks
    ]
    aggs.append(
        (F.sum(F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0))) / F.count(id_col)).alias("mrr")
    )
    return best.agg(*aggs)


def pairwise_prf(predicted_pairs: DataFrame, labeled: DataFrame) -> dict[str, float]:
    """Precision / recall / F1 of predicted same-cluster pairs against the
    labeled_pairs oracle (FIXTURES.md §4). Pairs are canonical (a < b).

    Only labeled pairs are judged (the labeled set defines the universe);
    predicted pairs outside it are ignored, mirroring "F1 on labeled pairs".
    """
    pred = predicted_pairs.select(
        F.least("a", "b").alias("mention_a"), F.greatest("a", "b").alias("mention_b")
    ).distinct().withColumn("predicted", F.lit(True))
    j = labeled.join(pred, ["mention_a", "mention_b"], "left").select(
        "is_match", F.coalesce("predicted", F.lit(False)).alias("predicted")
    )
    row = j.agg(
        F.sum(F.when(F.col("is_match") & F.col("predicted"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("predicted"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("predicted"), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}


def cluster_pairs(assignment: DataFrame) -> DataFrame:
    """(member, cluster_id) → canonical same-cluster pairs (a < b).

    Self-join on cluster_id; cluster sizes are bounded by the blocking
    layer upstream, so the join is block-local and never quadratic in N.
    """
    l = assignment.select(F.col("cluster_id"), F.col("member").alias("a"))
    r = assignment.select(F.col("cluster_id"), F.col("member").alias("b"))
    return l.join(r, "cluster_id").filter(F.col("a") < F.col("b")).select("a", "b")
