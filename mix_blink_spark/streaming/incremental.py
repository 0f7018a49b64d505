"""Append-increment processing over ``warc_ts`` (batch-incremental, the
Iceberg-snapshot pattern from SURVEY.md §2.7 — Structured Streaming is
deliberately not used: the north rule asks for resumable batch).

Protocol per increment:
  1. read the last committed watermark (max processed ``warc_ts``);
  2. select only newer pages (partition pruning on the Iceberg/parquet
     layout ``lang, days(warc_ts)`` makes this a metadata operation);
  3. link the delta's mentions with the standard pipeline;
  4. **merge** delta clusters with history:
       a. *shared-node merge*: graph nodes are content-addressed
          (``NORM::md5(norm)`` / ``ENT::id``), so a surface or entity
          anchor seen in both history and the delta produces a merge edge
          between its old and new cluster ids;
       b. *cross-batch near-miss merge*: genuinely-new delta surfaces are
          blocked and scored against the historical distinct-surface
          table (same keys, same ``score_pairs``, same ``tau_mm``), so a
          typo'd variant arriving in a later batch still joins its
          cluster — the edges a one-shot run would have found;
       c. a tiny connected-components over the (old_id, new_id) merge
          edges picks one canonical id per merged group (lexicographic
          min — ``ENT::`` ids sort before ``NORM::`` so entity-anchored
          identity wins by construction);
  5. commit the remapped assignment + node map durably (versioned
     parquet), and only then advance the watermark — data-then-watermark,
     the same protocol as plans/resume.StageStore: a crash between the
     two re-runs the increment, never skips it.

Scale notes: the historical state carried between increments is the
*distinct-surface* node map, not the corpus — step 4b is an equi-join on
blocking keys between two dimension-scale tables (no broadcast needed),
and the merge CC runs on cluster-id nodes only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import encode
from ..operators.blocking import cross_family_pairs, keyed_records
from ..operators.cc import connected_components
from ..operators.scoring import score_pairs
from ..plans.pipeline import ENT_PREFIX, NORM_PREFIX, LinkConfig, link

_ASSIGN_SCHEMA = "member string, cluster_id string"
_NODES_SCHEMA = "node string, norm string, cluster_id string"


class IncrementalStore:
    """Durable incremental state: versioned parquet snapshots of the
    assignment and the node map, with a JSON watermark committed LAST.

    Layout: ``<dir>/v<N>/{assignment,nodes}`` + ``<dir>/watermark.json``
    holding ``{max_warc_ts, version}``. Readers resolve through the
    watermark, so a half-written ``v<N+1>`` from a crash is invisible and
    simply overwritten on retry.

    ``retention``: how many committed versions to keep (None = keep all).
    With a retention set, every commit prunes versions older than the
    newest ``retention`` AFTER the watermark has advanced — so a crash at
    any point mid-compaction only ever leaves extra (or partially deleted)
    *stale* dirs behind, which no reader resolves (readers only follow the
    watermark) and which the next compaction sweep re-collects.
    """

    def __init__(self, spark: SparkSession, state_dir: str, retention: int | None = None):
        self.spark = spark
        self.state_dir = state_dir
        self.retention = retention
        os.makedirs(state_dir, exist_ok=True)
        self._wm_path = os.path.join(state_dir, "watermark.json")

    def _meta(self) -> dict | None:
        if not os.path.exists(self._wm_path):
            return None
        with open(self._wm_path) as f:
            return json.load(f)

    def watermark(self):
        m = self._meta()
        return m["max_warc_ts"] if m else None

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.state_dir, f"v{version}")

    def assignment(self) -> DataFrame | None:
        m = self._meta()
        if m is None:
            return None
        return self.spark.read.parquet(os.path.join(self._version_dir(m["version"]), "assignment"))

    def node_map(self) -> DataFrame | None:
        m = self._meta()
        if m is None:
            return None
        return self.spark.read.parquet(os.path.join(self._version_dir(m["version"]), "nodes"))

    def commit(self, assignment: DataFrame, nodes: DataFrame, max_ts) -> DataFrame:
        """Write both tables to the next version dir, then atomically advance
        the watermark. Returns the durably-committed assignment (read back
        from parquet — never a lazy plan over transient caches)."""
        m = self._meta()
        version = (m["version"] + 1) if m else 1
        vdir = self._version_dir(version)
        assignment.write.mode("overwrite").parquet(os.path.join(vdir, "assignment"))
        nodes.write.mode("overwrite").parquet(os.path.join(vdir, "nodes"))
        tmp = self._wm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_warc_ts": str(max_ts), "version": version}, f)
        os.replace(tmp, self._wm_path)
        if self.retention is not None:
            self.compact(self.retention)
        return self.spark.read.parquet(os.path.join(vdir, "assignment"))

    def compact(self, keep: int = 2) -> list[int]:
        """Delete version dirs older than the newest ``keep`` committed
        versions; returns the pruned version numbers. Runs strictly AFTER
        the watermark advance, and only ever touches versions below
        ``current - keep + 1``, so the watermark's version is never a
        deletion candidate — a crash mid-delete leaves partially-removed
        stale dirs that resolution never reads and a later sweep finishes."""
        import shutil

        m = self._meta()
        if m is None:
            return []
        cutoff = m["version"] - max(1, keep) + 1
        pruned = []
        for name in os.listdir(self.state_dir):
            if not name.startswith("v"):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v < cutoff:
                shutil.rmtree(os.path.join(self.state_dir, name), ignore_errors=True)
                pruned.append(v)
        return sorted(pruned)


def _delta_node_map(out: dict[str, DataFrame], cfg: LinkConfig) -> DataFrame:
    """(node, norm, cluster_id) for every graph node of a link() run:
    NORM:: surface nodes (carrying their norm text so later increments can
    re-block against them) and ENT:: anchor nodes (norm null)."""
    m = out["mentions"].select("mention_id", "norm").filter(F.length("norm") > 0)
    surf = (
        m.join(out["clusters"].withColumnRenamed("member", "mention_id"), "mention_id")
        .select(
            F.concat(F.lit(NORM_PREFIX), F.md5("norm")).alias("node"),
            "norm",
            "cluster_id",
        )
        .dropDuplicates(["node"])
    )
    anchors = (
        out["pairs_me"]
        .select(F.col("a").alias("node_a"), F.col("b").alias("node"))
        .join(surf.select(F.col("node").alias("node_a"), "cluster_id"), "node_a")
        .select("node", F.lit(None).cast("string").alias("norm"), "cluster_id")
        .dropDuplicates(["node"])
    )
    return surf.unionByName(anchors)


def _cross_batch_edges(
    delta_nodes: DataFrame, prev_nodes: DataFrame, cfg: LinkConfig
) -> DataFrame:
    """Merge edges between *new* delta surfaces and historical surfaces:
    block + score exactly like the in-batch mm stage (same keys, same
    combined score, same tau_mm). Returns (src=delta cluster_id,
    dst=prev cluster_id). Both sides are distinct-surface-scale; the join
    is a plain shuffle equi-join on blocking key (no broadcast assumption
    — history grows with corpus vocabulary)."""
    prev_surf = prev_nodes.filter(F.col("norm").isNotNull())
    new_surf = (
        delta_nodes.filter(F.col("norm").isNotNull())
        .join(prev_surf.select("node"), "node", "left_anti")
    )
    pairs = cross_family_pairs(
        keyed_records(new_surf, "node"),
        keyed_records(prev_surf, "node"),
        broadcast_right=False,
    )
    # pre-encode each dimension side once; join embeddings onto pairs
    enc = cfg.encoder or encode
    ea = new_surf.select(F.col("node").alias("a"), enc(F.col("norm")).alias("emb_a"))
    eb = prev_surf.select(F.col("node").alias("b"), enc(F.col("norm")).alias("emb_b"))
    scored = score_pairs(pairs.join(ea, "a").join(eb, "b"), cfg.measure, cfg.dense_weight)
    hits = scored.filter(F.col("score") >= cfg.tau_mm).select("a", "b")
    return (
        hits.join(delta_nodes.select(F.col("node").alias("a"), F.col("cluster_id").alias("src")), "a")
        .join(prev_nodes.select(F.col("node").alias("b"), F.col("cluster_id").alias("dst")), "b")
        .select("src", "dst")
        .distinct()
    )


def process_increment(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    store: IncrementalStore,
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Link only pages with warc_ts past the watermark, merge with the
    committed history (shared-node + cross-batch near-miss edges), commit
    durably, then advance the watermark. Returns the merged assignment."""
    cfg = cfg or LinkConfig()
    wm = store.watermark()
    delta = pages if wm is None else pages.filter(F.col("warc_ts") > F.lit(wm))
    if delta.isEmpty():
        prev = store.assignment()
        return prev if prev is not None else spark.createDataFrame([], _ASSIGN_SCHEMA)

    delta_spans = spans.join(delta.select("url"), "url", "left_semi")
    out = link(spark, delta, delta_spans, entities, cfg)
    delta_assign = out["clusters"]
    delta_nodes = _delta_node_map(out, cfg).persist()
    delta_nodes.count()

    prev_assign = store.assignment()
    max_ts = delta.agg(F.max("warc_ts").alias("m")).first()["m"]

    if prev_assign is None:
        merged = store.commit(delta_assign, delta_nodes, max_ts)
        delta_nodes.unpersist()
        return merged

    prev_nodes = store.node_map()
    shared = (
        delta_nodes.select("node", F.col("cluster_id").alias("src"))
        .join(prev_nodes.select("node", F.col("cluster_id").alias("dst")), "node")
        .select("src", "dst")
        .distinct()
    )
    near_miss = _cross_batch_edges(delta_nodes, prev_nodes, cfg)
    merge_edges = shared.unionByName(near_miss).filter(F.col("src") != F.col("dst"))

    # (old_id -> canonical): one canonical id per merged cluster group
    canon = connected_components(merge_edges).select(
        F.col("member").alias("old_id"), F.col("cluster_id").alias("canonical")
    )

    def remap(df: DataFrame) -> DataFrame:
        j = df.join(canon, df.cluster_id == canon.old_id, "left")
        return j.select(
            *[c for c in df.columns if c != "cluster_id"],
            F.coalesce("canonical", "cluster_id").alias("cluster_id"),
        )

    full_assign = remap(prev_assign.unionByName(delta_assign)).dropDuplicates(["member"])
    full_nodes = remap(prev_nodes.unionByName(delta_nodes)).dropDuplicates(["node"])
    merged = store.commit(full_assign, full_nodes, max_ts)
    delta_nodes.unpersist()
    return merged
