"""The reference's ``get_candidate`` mining path (SURVEY.md §3.3, J3/J4/S7).

Reference behavior (cli/get_candidates.py:31-53 + retriever/dense.py:101-122):
search k' = top_k + max(|labels|) per mention, then emit TWO lists per
mention — ``candidates`` = the raw top-k (``indices[:top_k]``, golds
INCLUDED) and ``hard_negatives`` = the gold-removed list truncated to
top_k (this is what ``negative=True`` training reads). Both replace any
values carried in the input file. The reference zips the lists back into
the nested input JSON positionally (``pop(0)`` per mention —
order-dependent); we keep the mining semantics exactly but the write-back
is a deterministic key join on ``mention_id`` (J4's documented fix), so it
is safe under any partitioning / ordering. Per-entity ``title``/``text``
fields from the input are carried through unchanged
(cli/get_candidates.py:42-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import hard_negatives
from .predict import _mention_hits


def _empty():
    return F.array().cast("array<string>")


def inject_candidates(dataset_mentions: DataFrame, mined: DataFrame) -> DataFrame:
    """S7 sink: re-nest flat mentions (from sources/jsonl.read_reference_dataset)
    back into the reference's document JSONL shape with ``candidates`` AND
    ``hard_negatives`` arrays injected per mention — by mention_id key join,
    entities ordered by span start, examples ordered by id.

    ``mined`` carries (mention_id, candidates, hard_negatives); mined
    mentions have BOTH fields replaced (the reference's contract — stale
    input hard_negatives are never passed through), mentions absent from
    ``mined`` keep their input lists. Per-entity title/text from the input
    survive the roundtrip (null fields are dropped on ``write.json``).

    Output schema: {doc-id, examples:[{id, text, entities:[{start, end,
    label, title, text, candidates, hard_negatives}]}]} —
    ``df.write.json(path)`` emits the reference-compatible file.
    """
    c = mined.select(
        "mention_id",
        F.col("candidates").alias("_cand"),
        F.col("hard_negatives").alias("_hn"),
    )
    m = (
        dataset_mentions.join(c, "mention_id", "left")
        .withColumn("candidates", F.coalesce("_cand", _empty()))
        .withColumn("hard_negatives", F.coalesce("_hn", "hard_negatives", _empty()))
    )
    ent = F.struct(
        F.col("start"), F.col("end"), F.col("labels").alias("label"),
        F.col("title"), F.col("ent_text").alias("text"),
        F.col("candidates"), F.col("hard_negatives"),
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


def mine_from_hits(
    hits: DataFrame,
    spans: DataFrame,
    golds: DataFrame,
    top_k: int = 10,
) -> DataFrame:
    """J4 list assembly from pre-ranked hits — the encoder-free core of
    ``mine_candidates`` (factored out so the driver gate can feed it
    exact-cosine hits over a SQL-expressible table).

    ``hits``: (rid, hit_id, score, rank) searched with
    k' >= top_k + max(|labels|) per rid; ``spans``: (url, mention_id,
    start, end); ``golds``: (mention_id, labels array<string>). Output
    matches ``mine_candidates``: spans re-emitted with ``candidates`` =
    raw top-k (golds included, dense.py:115) and ``hard_negatives`` =
    gold-removed top-k (dense.py:116-120); mentions with no hits get
    empty arrays (the key-join write-back, J4's documented fix).
    """
    g = golds.select(F.col("mention_id").alias("rid"), "labels")

    def collect_ranked(df: DataFrame, col: str) -> DataFrame:
        return (
            df.withColumn("pick", F.struct(F.col("rank"), F.col("hit_id")))
            .groupBy("rid")
            .agg(F.array_sort(F.collect_list("pick")).hit_id.alias(col))
            .withColumnRenamed("rid", "mention_id")
        )

    raw = collect_ranked(hits.filter(F.col("rank") <= top_k), "candidates")
    negs = collect_ranked(hard_negatives(hits, g, k=top_k), "hard_negatives")
    return (
        spans.join(golds.select("mention_id", "labels"), "mention_id", "left")
        .join(raw, "mention_id", "left")
        .join(negs, "mention_id", "left")
        .select(
            "url",
            "mention_id",
            "start",
            "end",
            "labels",
            F.coalesce("candidates", _empty()).alias("candidates"),
            F.coalesce("hard_negatives", _empty()).alias("hard_negatives"),
        )
    )


def mine_candidates(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    golds: DataFrame,
    top_k: int = 10,
    measure: str = "ip",
) -> DataFrame:
    """(url, mention_id, start, end, labels, candidates, hard_negatives) —
    the input spans re-emitted with the reference's two lists:
    ``candidates`` = raw top-k (golds included, dense.py:115),
    ``hard_negatives`` = gold-removed top-k (dense.py:116-120).

    ``top_k=10`` is the reference default (argparser.py:46). Searches
    k' = top_k + max(|labels|) (cli/get_candidates.py:35) through the
    full mention-encode pipeline, then assembles via ``mine_from_hits``.
    """
    max_labels = golds.agg(F.max(F.size("labels"))).first()[0] or 1
    hits = _mention_hits(spark, pages, spans, entities, k=top_k + max_labels, measure=measure)
    return mine_from_hits(hits, spans, golds, top_k=top_k)
