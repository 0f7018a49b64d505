"""Threshold calibration for the pairwise-score cut (tau_mm).

Scores every labeled mention pair with the production scoring kernel and
sweeps a threshold grid in ONE aggregation pass (cross join against the
grid, groupBy threshold): per-threshold precision/recall/F1 on direct
pair scores. This is a lower bound for the pipeline F1 (transitive
closure and entity anchors only add recall), so the argmax is a safe
default for ``LinkConfig.tau_mm``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import encode
from ..operators.scoring import score_pairs
from .pipeline import LinkConfig, build_mentions


def score_labeled_pairs(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    labeled: DataFrame,
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """(mention_a, mention_b, is_match, score) via the production kernel."""
    cfg = cfg or LinkConfig()
    m = build_mentions(pages, spans).select(
        F.col("mention_id"), "norm", encode(F.col("norm")).alias("emb")
    )
    a = m.select(
        F.col("mention_id").alias("mention_a"),
        F.col("norm").alias("norm_a"),
        F.col("emb").alias("emb_a"),
    )
    b = m.select(
        F.col("mention_id").alias("mention_b"),
        F.col("norm").alias("norm_b"),
        F.col("emb").alias("emb_b"),
    )
    pairs = labeled.join(a, "mention_a").join(b, "mention_b")
    return score_pairs(pairs, cfg.measure, cfg.dense_weight).select(
        "mention_a", "mention_b", "is_match", "score"
    )


def calibrate_threshold(
    scored: DataFrame,
    grid: list[float] | None = None,
) -> DataFrame:
    """One-pass sweep: (tau, tp, fp, fn, precision, recall, f1), best first."""
    grid = grid or [round(0.5 + 0.02 * i, 2) for i in range(25)]
    taus = scored.sparkSession.createDataFrame([(t,) for t in grid], "tau double")
    j = scored.crossJoin(F.broadcast(taus))
    pred = F.col("score") >= F.col("tau")
    agg = j.groupBy("tau").agg(
        F.sum(F.when(F.col("is_match") & pred, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & pred, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~pred, 1).otherwise(0)).alias("fn"),
    )
    precision = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    recall = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = 2 * precision * recall / F.greatest(precision + recall, F.lit(1e-9))
    return (
        agg.withColumn("precision", F.round(precision, 6))
        .withColumn("recall", F.round(recall, 6))
        .withColumn("f1", F.round(f1, 6))
        .orderBy(F.col("f1").desc(), F.col("tau"))
    )
