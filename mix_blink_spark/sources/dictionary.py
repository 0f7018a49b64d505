"""Entity dictionary dimension (SURVEY.md S2/P5/P6).

Reproduces ``EntityDictionary`` semantics from the reference
(mix_blink/data/dictionary.py):

  - NIL append (dictionary.py:67-72): extra row ``id="-1"``,
    ``name="[NIL]"``, description
    ``"[NIL] is an entity that does not exist in the dictionary."``;
  - encoding-text composition (dictionary.py:99-103):
    ``name + entity_token + description`` with fallback description
    ``f"{name} is an entity in this dictionary."`` when empty/null;
  - dense positional ids (dataset.py:69-70 label2id): ``row_number() - 1``
    over dictionary order — carried as a column, never positional state.

The dictionary is a small dimension: always broadcast into joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NIL_ID = "-1"
NIL_NAME = "[NIL]"
NIL_DESCRIPTION = "[NIL] is an entity that does not exist in the dictionary."
DEFAULT_ENTITY_TOKEN = "[ENT]"


def read_dictionary(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """JSONL/parquet scan of {id, name, description[, aliases]} (ref S1)."""
    reader = spark.read
    df = reader.json(path) if fmt == "json" else reader.parquet(path)
    cols = [F.col("id").cast("string"), F.col("name"), F.col("description")]
    if "aliases" in df.columns:
        cols.append(F.col("aliases"))
    return df.select(*cols)


def with_nil(entities: DataFrame) -> DataFrame:
    """Append the synthetic NIL row (dictionary.py:67-72)."""
    spark = entities.sparkSession
    extra = {c: None for c in entities.columns if c not in ("id", "name", "description")}
    nil_row = spark.createDataFrame(
        [{"id": NIL_ID, "name": NIL_NAME, "description": NIL_DESCRIPTION, **extra}],
        schema=entities.schema,
    )
    return entities.unionByName(nil_row)


def with_encoding_text(entities: DataFrame, entity_token: str = DEFAULT_ENTITY_TOKEN) -> DataFrame:
    """``enc_text = name + token + (description | fallback)`` (dictionary.py:99-103)."""
    desc = F.when(
        F.col("description").isNull() | (F.col("description") == ""),
        F.concat(F.col("name"), F.lit(" is an entity in this dictionary.")),
    ).otherwise(F.col("description"))
    return entities.withColumn("enc_text", F.concat(F.col("name"), F.lit(entity_token), desc))


def with_dense_ids(entities: DataFrame) -> DataFrame:
    """label2id as a column: position in dictionary order (dataset.py:69-70).

    Window over a constant key is fine: the dictionary is dimension-sized
    (broadcastable) by construction; this never runs on a fact table.
    """
    w = Window.orderBy(F.monotonically_increasing_id())
    return entities.withColumn("dense_id", F.row_number().over(w) - F.lit(1))


def explode_surfaces(entities: DataFrame) -> DataFrame:
    """One row per (entity, surface): canonical name + aliases. The unit the
    blocking stage indexes. NIL has no surfaces."""
    has_aliases = "aliases" in entities.columns
    surfaces = (
        F.array_union(F.array(F.col("name")), F.coalesce(F.col("aliases"), F.array()))
        if has_aliases
        else F.array(F.col("name"))
    )
    return (
        entities.filter(F.col("id") != NIL_ID)
        .withColumn("surface", F.explode(surfaces))
        .select("id", "name", "surface")
    )
