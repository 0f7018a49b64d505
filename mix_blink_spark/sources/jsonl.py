"""Reader for the reference's native dataset format (SURVEY.md S1/P1).

The reference consumes JSONL documents shaped (README.md:17-35,
data/dataset.py:13-22):

    {"doc-id": "...", "examples": [
        {"id": "...", "text": "...", "entities": [
            {"start": int, "end": int, "label": [ids...],
             "hard_negatives": [ids...]}]}]}

``read_reference_dataset`` loads that exact shape and performs the
double explode (document → example → mention, Preprocessor semantics
dataset.py:83-116) into the engine's flat mentions frame. Surfaces are
sliced with the same 1-based substring as P7. ``remove_nil`` label
resolution is the caller's next step (sources/pages.resolve_labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MENTION_SCHEMA = StructType(
    [
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
        StructField("label", ArrayType(StringType())),
        # zelda.py:58-60 writes title as a one-element list and
        # get_candidates passes it through — array on disk throughout
        StructField("title", ArrayType(StringType())),
        StructField("text", StringType()),
        StructField("hard_negatives", ArrayType(StringType())),
    ]
)
EXAMPLE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("text", StringType()),
        StructField("entities", ArrayType(MENTION_SCHEMA)),
    ]
)
DATASET_SCHEMA = StructType(
    [
        StructField("doc-id", StringType()),
        StructField("examples", ArrayType(EXAMPLE_SCHEMA)),
    ]
)


def read_reference_dataset(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → one row per mention:

    (doc_id, example_id, text, start, end, surface, labels, hard_negatives,
     mention_id) — zero-entity examples vanish in the explode, exactly like
    the reference's generator yielding nothing (dataset.py:83-116).
    """
    raw = spark.read.schema(DATASET_SCHEMA).json(path)
    ex = raw.select(
        F.col("`doc-id`").alias("doc_id"), F.explode("examples").alias("ex")
    ).select(
        "doc_id",
        F.col("ex.id").alias("example_id"),
        F.col("ex.text").alias("text"),
        F.posexplode("ex.entities").alias("pos", "m"),
    )
    return ex.select(
        "doc_id",
        "example_id",
        "text",
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.expr("substring(text, m.start + 1, m.end - m.start)").alias("surface"),
        F.col("m.label").alias("labels"),
        F.col("m.title").alias("title"),
        F.col("m.text").alias("ent_text"),
        F.coalesce(F.col("m.hard_negatives"), F.array().cast("array<string>")).alias(
            "hard_negatives"
        ),
        F.concat_ws("#", "example_id", F.col("pos").cast("string")).alias("mention_id"),
    )
