"""The reference's flagship read path re-expressed (SURVEY.md §3.1):

    blink_eval:  pages → mentions → encode → kNN(k=100) vs entity index
                 → best-rank counters → R@1/10/50/100 + MRR
    predict:     top-5 per mention with {name, id, similarity(4dp),
                 description[:300]}  (prediction/predict.py:40-52)

The entity index is the broadcast embedding matrix (J1): one row per
dictionary entry, encoded from the composed entity text's name part.
With a production encoder the same seam encodes the full
``name + [ENT] + description`` string (dictionary.py:99-103); the
deterministic trigram stand-in uses the normalized name+alias surfaces,
taking each entity's best-scoring surface (max over aliases — the
retrieval-relevant upper bound a trained bi-encoder approximates).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import encode
from ..functions.text import normalize_surface
from ..operators.metrics import best_ranks, recall_at_k
from ..operators.topk import knn_broadcast, predictions_payload
from ..sources.dictionary import explode_surfaces, with_nil
from .pipeline import build_mentions


def entity_index(
    entities: DataFrame, store_path: str | None = None
) -> tuple[np.ndarray, list[str]]:
    """(matrix, ids): one row per (entity, surface) — ids repeat per alias
    so the kNN layer scores every alias and the caller dedups to the best
    one (reference analog: one row per entity; aliases are our addition).

    With ``store_path`` (S8 analog, reference retriever/dense.py:124-151):
    a committed index at that path is LOADED instead of re-encoding the
    dictionary; otherwise the freshly-built index is persisted there
    (versioned, crash-safe — see plans.index_store) before returning."""
    if store_path is not None:
        from .index_store import EntityIndexStore

        store = EntityIndexStore(entities.sparkSession, store_path)
        loaded = store.load_matrix()
        if loaded is not None:
            return loaded

    # Encoding runs as a Spark job through the encoder pandas_udf (the
    # same seam pipeline.py:225-237 uses for alias pre-encode) and only the
    # FINISHED vectors are collected — with 10^6 aliases and a real
    # transformer behind the seam, the executors do the model work; the
    # driver never calls the encoder (round-3 verdict item 4). Rows are
    # sorted (id, norm) driver-side for a deterministic ord, independent of
    # partitioning.
    spark = entities.sparkSession
    surfs = (
        explode_surfaces(with_nil(entities))
        .withColumn("norm", normalize_surface(F.col("surface")))
        .select("id", "norm")
    )
    rows = sorted(
        surfs.withColumn("emb", encode(F.col("norm"))).collect(),
        key=lambda r: (r["id"], r["norm"]),
    )
    ids = [r["id"] for r in rows]
    mat = (
        np.array([r["emb"] for r in rows], dtype=np.float32)
        if rows
        else np.zeros((0, 0), np.float32)
    )

    if store_path is not None:
        from ..functions.embed import DIM

        index_df = spark.createDataFrame(
            [(i, ids[i], [float(x) for x in mat[i]]) for i in range(len(ids))],
            "ord int, id string, emb array<float>",
        )
        store.commit(
            index_df,
            {"encoder": "trigram", "dim": DIM, "n_rows": len(ids), "measure": "ip"},
        )
    return mat, ids


def _mention_hits(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    k: int,
    measure: str,
    index_store: str | None = None,
) -> DataFrame:
    """(rid=mention_id, hit_id=entity_id, score, rank) — per-alias hits
    deduped to each entity's best alias, then re-ranked."""
    from pyspark.sql.window import Window

    mat, ids = entity_index(entities, store_path=index_store)
    mentions = build_mentions(pages, spans).select(
        F.col("mention_id").alias("rid"), "norm"
    )
    m_emb = mentions.withColumn("emb", encode(F.col("norm")))
    # search deep enough that per-entity dedup still leaves k entities
    fanout = max(2, len(ids) // max(1, len(set(ids))))
    raw = knn_broadcast(m_emb, mat, ids, k=min(k * fanout, len(ids)), measure=measure)
    best_alias = raw.groupBy("rid", "hit_id").agg(F.max("score").alias("score"))
    order = F.col("score").asc() if measure == "l2" else F.col("score").desc()
    w = Window.partitionBy("rid").orderBy(order, F.col("hit_id"))
    return (
        best_alias.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def predict(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    top_k: int = 5,
    measure: str = "ip",
    index_store: str | None = None,
) -> DataFrame:
    """Reference predict: top-5 entities per mention, 4-dp similarity,
    300-char description (predict.py:23,46-47)."""
    hits = _mention_hits(spark, pages, spans, entities, top_k, measure, index_store)
    return predictions_payload(hits, with_nil(entities), top_k=top_k)


def evaluate(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    golds: DataFrame,
    k: int = 100,
    measure: str = "ip",
    index_store: str | None = None,
) -> DataFrame:
    """Reference blink_eval: R@1/10/50/100 + MRR over gold labels
    (evaluation/eval.py:17-59 formulas via operators/metrics)."""
    hits = _mention_hits(spark, pages, spans, entities, min(k, 100), measure, index_store)
    g = golds.select(F.col("mention_id").alias("rid"), "labels")
    best = best_ranks(hits, g)
    return recall_at_k(best, ks=(1, 10, 50, 100))
