"""The reference's ``get_candidate`` mining path (SURVEY.md §3.3, J3/J4/S7).

Reference behavior (cli/get_candidates.py + retriever/dense.py:101-122):
search k' = top_k + max(|labels|) per mention, remove gold ids, truncate
to top_k, then zip the candidate lists back into the nested input JSON
**positionally** (pop(0) per mention — order-dependent). We keep the
mining semantics exactly (mined lists never contain golds,
tests/test_retriever.py:185-190) but the write-back is a deterministic
key join on ``mention_id`` (J4's documented fix), so it is safe under any
partitioning / ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import hard_negatives
from .predict import _mention_hits


def inject_candidates(dataset_mentions: DataFrame, candidates: DataFrame) -> DataFrame:
    """S7 sink: re-nest flat mentions (from sources/jsonl.read_reference_dataset)
    back into the reference's document JSONL shape with ``candidates``
    arrays injected per mention — by mention_id key join, entities ordered
    by span start, examples ordered by id (deterministic; the reference's
    positional pop(0) zip, cli/get_candidates.py:31-53, is order-fragile).

    Output schema: {doc-id, examples:[{id, text, entities:[{start, end,
    label, hard_negatives, candidates}]}]} — ``df.write.json(path)`` emits
    the reference-compatible file.
    """
    c = candidates.select("mention_id", "candidates")
    m = dataset_mentions.join(c, "mention_id", "left").withColumn(
        "candidates", F.coalesce("candidates", F.array().cast("array<string>"))
    )
    ent = F.struct(
        F.col("start"), F.col("end"), F.col("labels").alias("label"),
        F.col("hard_negatives"), F.col("candidates"),
    )
    examples = (
        m.groupBy("doc_id", "example_id", "text")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("start").alias("_s"), ent.alias("e")))).e.alias("entities"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("example_id").alias("_k"),
                        F.struct(
                            F.col("example_id").alias("id"), F.col("text"), F.col("entities")
                        ).alias("ex"),
                    )
                )
            ).ex.alias("examples")
        )
    )
    return examples.select(F.col("doc_id").alias("doc-id"), "examples")


def mine_candidates(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    golds: DataFrame,
    top_k: int = 10,
    measure: str = "ip",
) -> DataFrame:
    """(url, mention_id, start, end, labels, candidates array<string>) —
    the input spans re-emitted with gold-free candidate ids injected.

    ``top_k=10`` is the reference default (argparser.py:46).
    """
    g = golds.select(F.col("mention_id").alias("rid"), "labels")
    max_labels = golds.agg(F.max(F.size("labels"))).first()[0] or 1
    hits = _mention_hits(spark, pages, spans, entities, k=top_k + max_labels, measure=measure)
    negs = hard_negatives(hits, g, k=top_k)
    cand = (
        negs.withColumn("pick", F.struct(F.col("rank"), F.col("hit_id")))
        .groupBy("rid")
        .agg(F.array_sort(F.collect_list("pick")).hit_id.alias("candidates"))
    )
    return (
        spans.join(golds.select("mention_id", "labels"), "mention_id", "left")
        .join(cand.withColumnRenamed("rid", "mention_id"), "mention_id", "left")
        .select(
            "url",
            "mention_id",
            "start",
            "end",
            "labels",
            F.coalesce("candidates", F.array().cast("array<string>")).alias("candidates"),
        )
    )
