"""The flagship end-to-end linkage pipeline (north_star stages 1-3).

    pages ──extract_text──► mentions(spans) ──keys──►┐
                                                     ├─ block join ─► pairs ─► score ─► edges ─► CC ─► clusters
    entities ──NIL+surfaces──keys──► (broadcast) ────┘

Graph construction:
  - **mention↔mention** edges: combined score ≥ ``tau_mm`` within blocks;
  - **mention→entity anchor** edges: each mention's top-1 entity surface
    with score ≥ ``tau_ent``. Entity nodes are namespaced ``ENT::<id>`` so
    they can't collide with mention ids, and only the *top-1* entity edge
    is kept per mention — one mention can therefore never transitively
    merge two dictionary entities (the reference links each mention to
    exactly one best entity the same way, prediction/predict.py:40-52).

Anchors give the cluster step the dictionary's alias knowledge (the
"Facebook"→Meta analog in the reference toy data, dataset_toy.jsonl:3):
two mentions with lexically unrelated aliases of the same entity meet at
the anchor. Pure-NIL duplicate mentions meet through mention↔mention
edges instead.

Scale notes (100 TB):
  - the only wide rows (``html``) die immediately after text extraction
    (column pruning — verified in tests via the explained plan);
  - entity surfaces are dimension-sized → broadcast join, no fact shuffle;
  - mention↔mention pairs shuffle on block_key with the size cap /
    sorted-neighborhood skew guard (operators/blocking.py);
  - CC runs on the (much smaller) above-threshold edge set with
    checkpointed iterations.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import encode
from ..functions.text import normalize_surface
from ..operators.blocking import candidate_pairs, cross_family_pairs, keyed_records
from ..operators.cc import clusters_with_singletons, connected_components
from ..operators.scoring import check_measure, score_pairs
from ..sources.dictionary import explode_surfaces, with_nil
from ..sources.pages import mentions_from_spans
from .resume import StageStore

ENT_PREFIX = "ENT::"


@dataclass
class LinkConfig:
    measure: str = "cos"
    dense_weight: float = 0.5
    tau_mm: float = 0.82       # mention<->mention edge threshold
    tau_ent: float = 0.80      # mention->entity anchor threshold
    max_block_size: int = 200
    neighborhood: int = 8

    def __post_init__(self) -> None:
        check_measure(self.measure)


def _with_emb(df: DataFrame, text_col: str = "norm") -> DataFrame:
    return df.withColumn("emb", encode(F.col(text_col)))


def _attach_embs(pairs: DataFrame, embs_a: DataFrame, embs_b: DataFrame) -> DataFrame:
    ea = embs_a.select(F.col("rid").alias("a"), F.col("emb").alias("emb_a"))
    eb = embs_b.select(F.col("rid").alias("b"), F.col("emb").alias("emb_b"))
    return pairs.join(ea, "a").join(eb, "b")


def build_mentions(pages: DataFrame, spans: DataFrame) -> DataFrame:
    return mentions_from_spans(pages, spans)


def link(
    spark: SparkSession,
    pages: DataFrame,
    spans: DataFrame,
    entities: DataFrame,
    cfg: LinkConfig | None = None,
    store: StageStore | None = None,
) -> dict[str, DataFrame]:
    """Run the full pipeline. With a ``store``, every stage is resumable.

    Returns dict with: mentions, pairs_mm, pairs_me, edges, clusters.
    cluster ids: min member id (entity anchors sort first via ENT:: prefix
    only by accident of lexicographics — ids are opaque).
    """
    cfg = cfg or LinkConfig()

    def stage(name: str, fn):
        return store.run(name, fn) if store is not None else fn()

    mentions = stage("mentions", lambda: build_mentions(pages, spans))

    # dimension side: dictionary surfaces (with NIL dropped from surfaces)
    ent_surfaces = (
        explode_surfaces(with_nil(entities))
        .withColumn("norm", normalize_surface(F.col("surface")))
        .withColumn("rid", F.concat(F.lit(ENT_PREFIX), F.col("id")))
        .select("rid", "id", "surface", "norm")
    )

    m_records = mentions.select(F.col("mention_id").alias("rid"), "norm")
    m_keyed = keyed_records(m_records, "rid").persist()
    e_keyed = keyed_records(ent_surfaces, "rid")

    m_embs = stage("mention_embs", lambda: _with_emb(m_records.distinct()))
    e_embs = _with_emb(ent_surfaces.select("rid", "norm").distinct())

    def mm_pairs():
        p = candidate_pairs(m_keyed, cfg.max_block_size, cfg.neighborhood)
        p = _attach_embs(p, m_embs, m_embs)
        return score_pairs(p, cfg.measure, cfg.dense_weight).select(
            "a", "b", "dense", "jw", "lev", "score"
        )

    def me_pairs():
        p = cross_family_pairs(m_keyed, e_keyed)
        p = _attach_embs(p, m_embs, e_embs)
        scored = score_pairs(p, cfg.measure, cfg.dense_weight)
        # top-1 entity per mention, deterministic tie-break on entity id
        from pyspark.sql.window import Window

        w = Window.partitionBy("a").orderBy(F.col("score").desc(), F.col("b"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter((F.col("rk") == 1) & (F.col("score") >= cfg.tau_ent))
            .select("a", "b", "dense", "jw", "lev", "score")
        )

    pairs_mm = stage("pairs_mm", mm_pairs)
    pairs_me = stage("pairs_me", me_pairs)

    def make_edges():
        mm = pairs_mm.filter(F.col("score") >= cfg.tau_mm).select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        me = pairs_me.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        return mm.unionByName(me)

    edges = stage("edges", make_edges)

    def cluster():
        assignment = connected_components(edges)
        # entity anchors are graph nodes, not members of the output
        mention_nodes = mentions.select(F.col("mention_id").alias("member"))
        full = clusters_with_singletons(assignment, mentions, "mention_id")
        return full.join(mention_nodes, "member")  # drop ENT:: rows

    clusters = stage("clusters", cluster)
    m_keyed.unpersist()

    return {
        "mentions": mentions,
        "pairs_mm": pairs_mm,
        "pairs_me": pairs_me,
        "edges": edges,
        "clusters": clusters,
    }
