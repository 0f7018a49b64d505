"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator (31 total, all oracle-gated) from SURVEY.md §2
plus the training-data-pipeline operators (dedup family, ANN, text
analysis); ``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL for the
driver's side-by-side correctness gate at sf=0.01.

Engine-portability rules used throughout (see mix_blink_spark/operators):
md5 for every content hash, decimal casts before big-sum aggregates,
explicit ROUND on float outputs, deterministic ORDER tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship near-dup clustering over documents (sf0.001 smoke)


def entry(spark: SparkSession) -> DataFrame:
    """documents -> unigram-shingle Jaccard pairs -> connected components ->
    cluster assignment with sizes (the dedup-clustering slice of the
    linkage pipeline; blocking/scoring/CC all exercised)."""
    from mix_blink_spark.operators.cc import clusters_with_singletons, connected_components
    from mix_blink_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, n=1, threshold=0.8)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    assign = clusters_with_singletons(connected_components(edges), docs, "doc_id")
    sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return assign.join(sizes, "cluster_id").select("member", "cluster_id", "cluster_size")


# ---------------------------------------------------------------------------
# queries


def q_s1_scan_filter(spark: SparkSession, sf: str) -> DataFrame:
    """S1: pruned scan — filter + projection reach the parquet reader."""
    return (
        _t(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars", F.substring("text", 1, 20).alias("head"))
    )


def q_p1_explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """P1: mention/token explosion with positions (posexplode)."""
    return (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    )


def q_p2_mention_marking(spark: SparkSession, sf: str) -> DataFrame:
    """P2: [START_ENT]/[END_ENT] splice at a fixed span (dataset.py:85)."""
    d = _t(spark, sf, "documents").filter(F.col("n_chars") >= 40)
    marked = F.concat(
        F.substring("text", 1, 10),
        F.lit("[START_ENT]"),
        F.substring("text", 11, 5),
        F.lit("[END_ENT]"),
        F.expr("substring(text, 16, length(text) - 15)"),
    )
    return d.select("doc_id", marked.alias("marked"))


def q_p4_label_resolution(spark: SparkSession, sf: str) -> DataFrame:
    """P4: array_intersect label resolution + empty-drop (dataset.py:94-116
    shape: labels ∩ dictionary, drop rows whose set empties). Size-only
    output (array ordering differs across engines)."""
    d = _t(spark, sf, "documents")
    labels = F.array(F.col("lang"), F.col("source"))
    known = F.array(*[F.lit(x) for x in ("en", "de", "fr", "src1", "src2", "src3")])
    resolved = F.array_intersect(labels, known)
    return (
        d.select("doc_id", F.size(resolved).alias("n_labels"))
        .filter(F.col("n_labels") > 0)
    )


def q_p5_entity_composition(spark: SparkSession, sf: str) -> DataFrame:
    """P5: name+[ENT]+description with empty-description fallback
    (dictionary.py:99-103), demonstrated on the part dimension."""
    p = _t(spark, sf, "part")
    desc = F.when(F.col("p_size") < 5, F.lit("")).otherwise(F.col("p_type"))
    enc = F.concat(
        F.col("p_name"),
        F.lit("[ENT]"),
        F.when(desc == "", F.concat(F.col("p_name"), F.lit(" is an entity in this dictionary."))).otherwise(desc),
    )
    return p.select("p_partkey", enc.alias("enc_text"))


def q_p6_dict_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """P6: dictionary lookup as broadcast-hash join (nation x region)."""
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


def q_p7_surface_slice(spark: SparkSession, sf: str) -> DataFrame:
    """P7: per-row computed substring slice (predict.py:39 semantics)."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", F.expr("substring(text, n_chars % 20 + 1, 10)").alias("surface")
    )


def q_blocking_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Blocking stage: normalized first-token key histogram per lang."""
    d = _t(spark, sf, "documents")
    key = F.substring_index(F.col("text"), " ", 1)
    return (
        d.groupBy(F.col("lang"), key.alias("block_key"))
        .agg(F.count("*").alias("block_n"))
        .filter(F.col("block_n") > 1)
    )


def _block_pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.substring_index("text", " ", 1).alias("block_key"),
        F.substring("text", 1, 30).alias("head"),
    )
    a = d.select("lang", "block_key", F.col("doc_id").alias("a"), F.col("head").alias("head_a"))
    b = d.select("lang", "block_key", F.col("doc_id").alias("b"), F.col("head").alias("head_b"))
    return a.join(b, ["lang", "block_key"]).filter(F.col("a") < F.col("b"))


def q_block_pairs_lev(spark: SparkSession, sf: str) -> DataFrame:
    """Block-local pair scoring: Levenshtein distance (JVM built-in) on
    30-char heads of docs sharing (lang, first-token) blocks."""
    return _block_pairs(spark, sf).select(
        "a", "b", F.levenshtein("head_a", "head_b").alias("lev")
    )


def q_jw_pair_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Jaro-Winkler pair scoring in the Arrow pandas_udf kernel."""
    from mix_blink_spark.functions.strsim import jaro_winkler_udf

    return _block_pairs(spark, sf).select(
        "a", "b", F.round(jaro_winkler_udf(F.col("head_a"), F.col("head_b")), 6).alias("jw")
    )


def q_knn_top5(spark: SparkSession, sf: str) -> DataFrame:
    """J2/T1: exact cosine top-5 per query via broadcast matrix + matmul."""
    from mix_blink_spark.operators.knn import brute_force_topk

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    hits = brute_force_topk(q, e, k=5)
    # ranks only: float scores are not hash-comparable across engines
    # (summation order differs); ordering parity is the real check
    return hits.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("hit_id").cast("bigint").alias("hit_id"),
        "rank",
    )


def q_recall_mrr(spark: SparkSession, sf: str) -> DataFrame:
    """A1/A2: Recall@K + MRR with reference formulas (gold = same label)."""
    from mix_blink_spark.operators.knn import brute_force_topk
    from mix_blink_spark.operators.metrics import best_ranks, recall_at_k

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 100)
    hits = brute_force_topk(q, e, k=100).withColumnRenamed("vec_id", "rid")
    golds = (
        q.alias("q")
        .join(e.alias("c"), F.col("q.label") == F.col("c.label"))
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .groupBy(F.col("q.vec_id").cast("string").alias("rid"))
        .agg(F.collect_set(F.col("c.vec_id").cast("string")).alias("labels"))
    )
    best = best_ranks(hits, golds)
    m = recall_at_k(best, ks=(1, 10, 50, 100))
    return m.select(*[F.round(c, 6).alias(c) for c in m.columns])


def q_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """J3: top-10 gold-excluding hard negatives per query (golds never
    appear; re-ranked 1..10)."""
    from mix_blink_spark.operators.knn import brute_force_topk
    from mix_blink_spark.operators.topk import hard_negatives

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 50)
    hits = brute_force_topk(q, e, k=100).withColumnRenamed("vec_id", "rid")
    golds = (
        q.alias("q")
        .join(e.alias("c"), F.col("q.label") == F.col("c.label"))
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .groupBy(F.col("q.vec_id").cast("string").alias("rid"))
        .agg(F.collect_set(F.col("c.vec_id").cast("string")).alias("labels"))
    )
    negs = hard_negatives(hits, golds, k=10)
    return negs.select(
        F.col("rid").cast("bigint").alias("vec_id"),
        F.col("hit_id").cast("bigint").alias("hit_id"),
        "rank",
    )


def q_mined_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """J4/S7 driver gate (round-4 verdict item 7): the reference's
    ``get_candidate`` dual-list contract — ``candidates`` = raw top-10
    (golds INCLUDED, dense.py:115), ``hard_negatives`` = gold-removed
    top-10 (dense.py:116-120) — assembled by ``mine_from_hits`` over
    exact-cosine hits with k' = 10 + max(|labels|)
    (cli/get_candidates.py:35), written back as a mention_id key join
    with empty-array fallback for unmined mentions. Golds exist only for
    EVEN query ids (odd ids exercise the no-gold passthrough); span ids
    50-59 are never searched (exercise the empty-array fallback). Lists
    are emitted as CSV strings so the value hash is array-order-exact."""
    from mix_blink_spark.operators.knn import brute_force_topk
    from mix_blink_spark.plans.candidates import mine_from_hits

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 50)
    golds = (
        q.alias("q")
        .filter(F.col("q.vec_id") % 2 == 0)
        .join(e.alias("c"), F.col("q.label") == F.col("c.label"))
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .groupBy(F.col("q.vec_id").cast("string").alias("mention_id"))
        .agg(F.collect_set(F.col("c.vec_id").cast("string")).alias("labels"))
    )
    max_labels = golds.agg(F.max(F.size("labels"))).first()[0] or 1
    hits = brute_force_topk(q, e, k=10 + max_labels).withColumnRenamed("vec_id", "rid")
    spans = e.filter(F.col("vec_id") < 60).select(
        F.concat(F.lit("u"), F.col("vec_id")).alias("url"),
        F.col("vec_id").cast("string").alias("mention_id"),
        F.lit(0).alias("start"),
        F.lit(1).alias("end"),
    )
    out = mine_from_hits(hits, spans, golds, top_k=10)
    return out.select(
        F.col("mention_id").cast("bigint").alias("mention_id"),
        F.size("candidates").alias("n_cand"),
        F.concat_ws(",", "candidates").alias("cand_csv"),
        F.size("hard_negatives").alias("n_negs"),
        F.concat_ws(",", "hard_negatives").alias("negs_csv"),
    )


def q_predictions_top5(spark: SparkSession, sf: str) -> DataFrame:
    """S6/P8/F5 driver gate: the reference's prediction payload — top-5 per
    mention with entity name/id via a broadcast dim join, similarity
    rounded to 4 dp (predict.py:23,46), description truncated to 300
    chars (predict.py:40-52). Hits are exact cosine over embeddings; the
    entity dim is derived from documents (id = doc_id)."""
    from mix_blink_spark.operators.knn import brute_force_topk
    from mix_blink_spark.operators.topk import predictions_payload

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    hits = brute_force_topk(q, e, k=5).withColumnRenamed("vec_id", "rid")
    ents = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("id"),
        F.substring("text", 1, 12).alias("name"),
        F.col("text").alias("description"),
    )
    out = predictions_payload(hits, ents, top_k=5)
    return out.select(
        F.col("rid").cast("bigint").alias("mention_id"),
        "rank",
        "name",
        F.col("id").cast("bigint").alias("id"),
        "similarity",
        F.length("description").alias("desc_len"),
        F.substring("description", 290, 11).alias("desc_tail"),
    )


def q_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """A5: large-star/small-star CC on a deterministic chain graph."""
    from mix_blink_spark.operators.cc import connected_components

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    edges = d.select(
        F.lpad(F.col("doc_id").cast("string"), 5, "0").alias("src"),
        F.lpad((F.col("doc_id") + F.col("n_chars") % 5 + 1).cast("string"), 5, "0").alias("dst"),
    )
    return connected_components(edges)


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-shingle Jaccard near-dup pairs (bounded query subset)."""
    from mix_blink_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 60)
    return ngram_jaccard_pairs(d, n=1, threshold=0.7)


def q_dedup_decisions(spark: SparkSession, sf: str) -> DataFrame:
    """Combined keep/drop_exact/drop_near decisions (min-id survivor)."""
    from mix_blink_spark.operators.dedup import dedup_decisions

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 60)
    return dedup_decisions(d, jaccard_threshold=0.7, n=1)


def q_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.operators.dedup import minhash_signatures

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return minhash_signatures(d, bands=2, rows=2, n=3)


def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Banded LSH candidate pairs — docs sharing any (band, sig) bucket
    (the bucket equi-join itself, driver-gated per round-5 verdict item 6;
    the signatures feeding it are gated separately)."""
    from mix_blink_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    # bands=2/rows=1/bigram shingles: loose enough that the bucket join
    # actually fires on this corpus slice (216 pairs at sf0.01 — a
    # tighter setting returns zero rows and gates nothing)
    return minhash_lsh_pairs(d, bands=2, rows=1, n=2)


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.operators.dedup import simhash

    return simhash(_t(spark, sf, "documents").filter(F.col("doc_id") < 200), bits=16)


def q_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.operators.knn import embedding_neardup_pairs

    e = _t(spark, sf, "embeddings")
    # size hint from the parquet footer: no Spark job for the dispatch
    import pyarrow.dataset as ds

    n = ds.dataset(f"{sf}/embeddings.parquet").count_rows()
    out = embedding_neardup_pairs(e, threshold=0.3, k=5, n_rows=n)
    # operator ids are opaque strings; re-canonicalize numerically to match
    # the BIGINT least/greatest in the oracle
    ai = F.col("a").cast("bigint")
    bi = F.col("b").cast("bigint")
    return out.select(F.least(ai, bi).alias("a"), F.greatest(ai, bi).alias("b")).distinct()


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.functions.textstats import text_stats

    return text_stats(_t(spark, sf, "documents"))


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from mix_blink_spark.functions.textstats import fingerprint

    return fingerprint(_t(spark, sf, "documents"), w=5)


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: decimal-cast sums for exactness,
    emitted as round(double) per the repo's float-output portability rule
    (decimal scale rendering is engine-specific; the exact decimal sum cast
    to double is the same IEEE value on both engines)."""
    l = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sbp"),
            F.sum(price * (F.lit(1).cast("decimal(18,6)") - disc)).alias("_sdp"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("_sq").cast("double"), 2).alias("sum_qty"),
            F.round(F.col("_sbp").cast("double"), 2).alias("sum_base_price"),
            F.round(F.col("_sdp").cast("double"), 2).alias("sum_disc_price"),
            "count_order",
        )
    )


def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority top-10: broadcast dim filter +
    two joins + decimal revenue + deterministic top-k.

    The orders side carries a SHUFFLE_HASH hint (round 8, guide §3.1 —
    pick the strategy deliberately): the date filter keeps ~97% of
    orders, so the auto-chosen broadcast built a 1.5M-row hash relation
    on the driver every run — measured 1.79 s median (5.4 s cold) vs
    0.86 s with the orders side shuffled at sf1.0; rows identical (the
    dim-sized customer side stays broadcast)."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15")).hint("shuffle_hash")
    l = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            F.round(F.col("_rev").cast("double"), 2).alias("revenue"),
        )
    )


def q_events_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 5-min window aggregation (batch form of the streaming op)."""
    e = _t(spark, sf, "events")
    bucket = F.floor(F.unix_timestamp("ts") / 300).cast("bigint")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sv"),
        )
        .select(
            "event_type",
            "bucket",
            "n",
            F.round(F.col("_sv").cast("double"), 4).alias("sum_value"),
        )
    )


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap starts a new session; output
    sessions per user (stateful-streaming semantics in batch)."""
    e = _t(spark, sf, "events").select("user_id", F.unix_timestamp("ts").alias("secs"))
    w = Window.partitionBy("user_id").orderBy("secs")
    prev = F.lag("secs").over(w)
    gap = F.when(prev.isNull() | ((F.col("secs") - prev) > 1800), 1).otherwise(0)
    marked = e.withColumn("new_s", gap)
    return marked.groupBy("user_id").agg(F.sum("new_s").cast("bigint").alias("n_sessions"))


# handoff dir for the ER independent oracle: the Spark query materializes
# its cluster assignment + the fixture's labeled pairs here, and the DuckDB
# oracle recomputes EVERY output column (member/cluster counts, tp/fp/fn,
# F1, the >=0.99 bound) from those files with its own SQL — nothing in the
# expected side is produced by the engine's metric code.
# Env-overridable so concurrent gate runs (or a parallel test session) get
# disjoint handoff dirs; queries() and oracle_sql() are imported by the
# same driver process, so both sides resolve the same value. The oracle
# SQL below interpolates THIS constant (f-string) — the two can never
# desync (round-3 ADVICE).
import os as _os

# default is PER-PROCESS (pid-suffixed): two concurrent gate runs with
# default env can never clobber each other's handoff parquet (round-4
# verdict item 3). queries() and oracle_sql() are imported by the same
# driver process, so both sides resolve the identical value. The default
# dir is removed at process exit (below, round-5 ADVICE): stale
# /tmp/mbs-oracle-er-<pid> dirs no longer accumulate across runs, and if
# queries() and oracle_sql() were ever evaluated in DIFFERENT processes
# the oracle fails loudly on a missing path (DuckDB "No files found ...
# mbs-oracle-er-<pid>") instead of silently reading a previous run's
# clusters. An explicit SPARK_GRAFT_ER_ORACLE_DIR is the caller's to
# manage and is left in place.
ER_ORACLE_DIR = _os.environ.get(
    "SPARK_GRAFT_ER_ORACLE_DIR", f"/tmp/mbs-oracle-er-{_os.getpid()}"
)

_er_oracle_cleanup_registered = False


def _register_er_oracle_cleanup() -> None:
    """Register the exit-time rmtree of the default ER oracle dir — called
    lazily from the ONE place that writes it (q_er_link_clusters), never at
    import time (round-6 ADVICE): this module is shipped to Spark Python
    workers via pyFiles, and an import-time atexit would register a delete
    in every worker process too. Pid-suffixing already scopes each process
    to its own dir, but cleanup belongs only to the process that wrote the
    data. Explicit SPARK_GRAFT_ER_ORACLE_DIR stays caller-managed."""
    global _er_oracle_cleanup_registered
    if _er_oracle_cleanup_registered or "SPARK_GRAFT_ER_ORACLE_DIR" in _os.environ:
        return
    import atexit as _atexit
    import shutil as _shutil

    _atexit.register(_shutil.rmtree, ER_ORACLE_DIR, ignore_errors=True)
    _er_oracle_cleanup_registered = True


def q_er_link_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship ER pipeline on the synthetic web-page corpus, summarized as
    ONE row: member/cluster counts + pairwise P/R/F1 against the fixture's
    labeled pairs + the north-rule F1>=0.99 bound. The cluster assignment
    and labeled pairs are written to ER_ORACLE_DIR at query-build time so
    the DuckDB oracle can recompute the row independently (round-2 verdict
    item 2 — replaces the pinned expected_oracles.py table). Full-assignment
    and fresh-seed F1 checks live in tests/test_pipeline_e2e.py."""
    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.operators.metrics import cluster_pairs, pairwise_prf
    from mix_blink_spark.plans.pipeline import LinkConfig, link

    n_pages = 400 if "0.001" in sf else 1500
    pages, ents, golds, labeled = corpus_dfs(spark, seed=7, n_pages=n_pages, n_entities=60)
    spans = golds.select("url", "mention_id", "start", "end")
    # broadcast_spans exercises the shuffle-free mentions join (the bench
    # path's plan) under the correctness gate; output is join-order-invariant
    out = link(spark, pages, spans, ents, LinkConfig(broadcast_spans=True))
    clusters = out["clusters"].persist()
    _register_er_oracle_cleanup()
    clusters.write.mode("overwrite").parquet(f"{ER_ORACLE_DIR}/clusters")
    labeled.write.mode("overwrite").parquet(f"{ER_ORACLE_DIR}/labeled")
    prf = pairwise_prf(cluster_pairs(clusters), labeled)
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    clusters.unpersist()
    tp, fp, fn = int(prf["tp"]), int(prf["fp"]), int(prf["fn"])
    # same closed form the SQL oracle uses (2tp/(2tp+fp+fn)), evaluated in
    # double — identical to precision/recall composition but bit-stable
    f1 = 2.0 * tp / (2.0 * tp + fp + fn) if tp else 0.0
    return spark.createDataFrame(
        [(n_members, n_clusters, tp, fp, fn, round(f1, 6), f1 >= 0.99)],
        "n_members bigint, n_clusters bigint, tp bigint, fp bigint, fn bigint, "
        "pairwise_f1 double, f1_ge_099 boolean",
    )


def q_inbatch_scoring(spark: SparkSession, sf: str) -> DataFrame:
    """J5/F4/A3: in-batch scoring matrix — per batch, mentions score
    against every in-batch gold (ip measure), temperature CE loss +
    argmax recall. Batches are built tie-free (one mention per label per
    batch: gold = a label's min-id vector, mention = its 2nd vector) so
    the SQL oracle's argmax needs no positional tie-break. Each mention
    carries H=2 hard negatives (its label's 3rd and 4th vectors — every
    label in the test embeddings has >=4), exercising the B x (B+H)
    reference reshape path (collator.py:70-72) through the driver gate."""
    from mix_blink_spark.operators.training import inbatch_score_matrix

    e = _t(spark, sf, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    ranked = e.withColumn("rk", F.row_number().over(w))
    gold = ranked.filter(F.col("rk") == 1).select("label", F.col("embedding").alias("gold_emb"))
    ment = ranked.filter(F.col("rk") == 2).select("vec_id", "label", "embedding")
    negs = (
        ranked.filter(F.col("rk").isin(3, 4))
        .groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("rk", "embedding"))).alias("_ns"))
        .select("label", F.expr("transform(_ns, s -> s.embedding)").alias("neg_embs"))
    )
    # LEFT join + empty-array fallback: a label with <4 vectors keeps its
    # mention with no negatives — the DuckDB oracle's semantics (its negs
    # CTE simply contributes no rows for such labels). The test embeddings
    # happen to have >=42 vectors/label, but the gate must not silently
    # couple to that fixture property (round-3 ADVICE).
    rows = ment.join(gold, "label").join(negs, "label", "left").withColumn(
        "neg_embs",
        F.coalesce(F.col("neg_embs"), F.array().cast("array<array<float>>")),
    ).select(
        F.pmod(F.col("label").cast("bigint"), F.lit(4)).cast("string").alias("batch_id"),
        F.lpad(F.col("vec_id").cast("string"), 8, "0").alias("rid"),
        F.col("embedding").alias("emb"),
        "gold_emb",
        "neg_embs",
    )
    out = inbatch_score_matrix(rows, measure="ip", temperature=0.1)
    return out.select(
        "batch_id",
        F.round("loss", 6).alias("loss"),
        F.round("recall", 6).alias("recall"),
        "n_mentions",
        "n_negatives",
    )


def _ann_recall_row(spark: SparkSession, sf: str, approx: DataFrame, bound: float, bound_col: str) -> DataFrame:
    """1-row independent-oracle shape for approximate ANN (round-2 verdict
    item 2): the DuckDB side recomputes ``n_queries`` and
    ``sum_exact_top1`` from the parquet table with its own exact-cosine
    SQL (the knn_top5 oracle pattern), so the exact reference the recall
    is measured against is itself value-checked; the recall bound is a
    semantic constant, not pinned engine output."""
    from mix_blink_spark.operators.knn import brute_force_topk

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    exact = brute_force_topk(e, e, k=1).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("hit_id").cast("bigint").alias("exact_hit"),
    )
    j = exact.join(approx, "vec_id", "left")
    return j.agg(
        F.count("*").alias("n_queries"),
        F.sum("exact_hit").alias("sum_exact_top1"),
        (
            F.avg(F.when(F.col("approx_hit") == F.col("exact_hit"), 1.0).otherwise(0.0))
            >= bound
        ).alias(bound_col),
    )


def q_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization (the Common-Crawl dedup-key primitive,
    functions/urls.py): scheme/host lowercasing, default-port and fragment
    stripping, tracking-param removal — pure column expressions. Input
    URLs are synthesized deterministically from doc_id (the driver tables
    carry no URL column; the oracle builds the identical strings)."""
    from mix_blink_spark.functions.urls import canonicalize_url

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    i = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("HTTP://Example.COM:80/doc/"), i,
                        F.lit("?utm_source=x&id="), i, F.lit("#top")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("https://cdn.Example.com:443/a/"), i, F.lit("?fbclid=abc")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("https://example.com:8080/b?id="), i, F.lit("&utm_medium=m&q=1")))
        .otherwise(F.concat(F.lit("http://Host.example.com/c/"), i))
    )
    return d.select("doc_id", url.alias("url")).select(
        "doc_id", "url", canonicalize_url(F.col("url")).alias("canon_url")
    )


def q_ann_lsh_top1(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH buckets, gated as
    recall@1 vs exact top-1 (bits=4/tables=24 measures 0.96-0.98 on the
    near-uniform synthetic embeddings at every sf; bound 0.90)."""
    from mix_blink_spark.operators.knn import lsh_topk

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    # dim passed through: skips lsh_topk's `.first()` dimension-probe job
    # (round-4 verdict item 4) — the testdata embeddings are 64-d
    approx = lsh_topk(e, k=1, bits=4, tables=24, dim=64).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("hit_id").cast("bigint").alias("approx_hit"),
    )
    return _ann_recall_row(spark, sf, approx, 0.90, "recall_ge_090")


def q_ann_ivf_top1(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-bucketed approximate ANN, gated as recall@1 vs exact top-1
    (8 centroids / 6 probes measures 0.92-0.95 at every sf; bound 0.85)."""
    from mix_blink_spark.operators.knn import ivf_topk

    e = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    approx = ivf_topk(e, k=1, n_centroids=8, n_probe=6).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("hit_id").cast("bigint").alias("approx_hit"),
    )
    return _ann_recall_row(spark, sf, approx, 0.85, "recall_ge_085")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s1_scan_filter": q_s1_scan_filter,
        "p1_explode_tokens": q_p1_explode_tokens,
        "p2_mention_marking": q_p2_mention_marking,
        "p4_label_resolution": q_p4_label_resolution,
        "p5_entity_composition": q_p5_entity_composition,
        "p6_dict_lookup": q_p6_dict_lookup,
        "p7_surface_slice": q_p7_surface_slice,
        "blocking_keys": q_blocking_keys,
        "block_pairs_lev": q_block_pairs_lev,
        "jw_pair_scores": q_jw_pair_scores,
        "knn_top5": q_knn_top5,
        "recall_mrr": q_recall_mrr,
        "hard_negatives": q_hard_negatives,
        "mined_candidates": q_mined_candidates,
        "predictions_top5": q_predictions_top5,
        "connected_components": q_connected_components,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_decisions": q_dedup_decisions,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "text_stats": q_text_stats,
        "fingerprint": q_fingerprint,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "events_window": q_events_window,
        "events_sessionize": q_events_sessionize,
        "inbatch_scoring": q_inbatch_scoring,
        "url_canonicalize": q_url_canonicalize,
        "er_link_clusters": q_er_link_clusters,
        "ann_lsh_top1": q_ann_lsh_top1,
        "ann_ivf_top1": q_ann_ivf_top1,
    }


# exact cosine top-1 over embeddings (vec_id < 200) in pure SQL — the
# independent reference both ANN recall oracles aggregate over
_EXACT_TOP1_CTE = """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i
                        FROM embeddings WHERE vec_id < 200),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            ranked AS (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rk
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id)
"""


def _ann_recall_oracle(bound_col: str) -> str:
    """n_queries + sum of exact top-1 hit ids computed from scratch in SQL;
    the recall bound column is a semantic constant (TRUE = the engine's
    approximate path must reach the bound vs this exact reference)."""
    return (
        _EXACT_TOP1_CTE
        + f"""
            SELECT CAST(count(*) AS BIGINT) AS n_queries,
                   CAST(sum(c_id) AS BIGINT) AS sum_exact_top1,
                   TRUE AS {bound_col}
            FROM ranked WHERE rk = 1
        """
    )


# DuckDB recomputation of the ER summary row from the engine's materialized
# cluster assignment + the fixture's labeled pairs (written by
# q_er_link_clusters at query-build time): pair expansion, tp/fp/fn over the
# labeled universe, F1 and the >=0.99 bound are all SQL-side.
_ER_CLUSTERS_ORACLE = f"""
            WITH c AS (SELECT * FROM read_parquet('{ER_ORACLE_DIR}/clusters/*.parquet')),
            lab AS (SELECT * FROM read_parquet('{ER_ORACLE_DIR}/labeled/*.parquet')),
            pred AS (SELECT DISTINCT a.member AS ma, b.member AS mb
                     FROM c a JOIN c b ON a.cluster_id = b.cluster_id
                     WHERE a.member < b.member),
            j AS (SELECT lab.is_match, pred.ma IS NOT NULL AS predicted
                  FROM lab LEFT JOIN pred
                    ON pred.ma = least(lab.mention_a, lab.mention_b)
                   AND pred.mb = greatest(lab.mention_a, lab.mention_b)),
            agg AS (SELECT
                      sum(CASE WHEN is_match AND predicted THEN 1 ELSE 0 END) AS tp,
                      sum(CASE WHEN NOT is_match AND predicted THEN 1 ELSE 0 END) AS fp,
                      sum(CASE WHEN is_match AND NOT predicted THEN 1 ELSE 0 END) AS fn
                    FROM j),
            f AS (SELECT tp, fp, fn,
                         CASE WHEN tp = 0 THEN 0.0
                              ELSE 2.0 * tp / (2.0 * tp + fp + fn) END AS f1
                  FROM agg)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_members,
                   (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM c) AS n_clusters,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   round(f1, 6) AS pairwise_f1,
                   f1 >= 0.99 AS f1_ge_099
            FROM f
"""


def oracle_sql() -> dict[str, str]:
    return {
        "url_canonicalize": """
            WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
            raw AS (SELECT doc_id,
                     CASE doc_id % 4
                       WHEN 0 THEN 'HTTP://Example.COM:80/doc/' || doc_id || '?utm_source=x&id=' || doc_id || '#top'
                       WHEN 1 THEN 'https://cdn.Example.com:443/a/' || doc_id || '?fbclid=abc'
                       WHEN 2 THEN 'https://example.com:8080/b?id=' || doc_id || '&utm_medium=m&q=1'
                       ELSE 'http://Host.example.com/c/' || doc_id
                     END AS url FROM d),
            parts AS (SELECT doc_id, url,
                       regexp_replace(url, '#.*$', '') AS u FROM raw),
            p2 AS (SELECT doc_id, url, u,
                    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS rest
                   FROM parts),
            p3 AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS authority FROM p2),
            p4 AS (SELECT *, substr(rest, length(authority) + 1) AS tail,
                    CASE WHEN scheme = 'http' THEN regexp_replace(lower(authority), ':80$', '')
                         WHEN scheme = 'https' THEN regexp_replace(lower(authority), ':443$', '')
                         ELSE lower(authority) END AS auth_np
                   FROM p3),
            p5 AS (SELECT *, regexp_extract(tail, '^([^?]*)', 1) AS path,
                    CASE WHEN length(tail) > length(regexp_extract(tail, '^([^?]*)', 1))
                         THEN substr(tail, length(regexp_extract(tail, '^([^?]*)', 1)) + 2)
                         ELSE '' END AS query
                   FROM p4),
            p6 AS (SELECT *, array_to_string(
                     list_filter(string_split(query, '&'),
                       p -> length(p) > 0 AND NOT regexp_matches(p, '^(utm_|fbclid=|gclid=|msclkid=)')),
                     '&') AS new_query
                   FROM p5)
            SELECT doc_id, url,
                   scheme || '://' || auth_np || path ||
                   CASE WHEN length(new_query) > 0 THEN '?' || new_query ELSE '' END
                   AS canon_url
            FROM p6
        """,
        "ann_lsh_top1": _ann_recall_oracle("recall_ge_090"),
        "ann_ivf_top1": _ann_recall_oracle("recall_ge_085"),
        "er_link_clusters": _ER_CLUSTERS_ORACLE,
        "s1_scan_filter": """
            SELECT doc_id, n_chars, substr(text, 1, 20) AS head
            FROM documents WHERE lang = 'en'
        """,
        "p1_explode_tokens": """
            SELECT doc_id, pos - 1 AS pos, tok FROM (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents WHERE doc_id < 50)
        """,
        "p2_mention_marking": """
            SELECT doc_id,
                   substr(text,1,10) || '[START_ENT]' || substr(text,11,5)
                   || '[END_ENT]' || substr(text,16,length(text)-15) AS marked
            FROM documents WHERE n_chars >= 40
        """,
        "p4_label_resolution": """
            SELECT doc_id,
                   CAST(len(list_intersect([lang, source],
                       ['en','de','fr','src1','src2','src3'])) AS INT) AS n_labels
            FROM documents
            WHERE len(list_intersect([lang, source],
                      ['en','de','fr','src1','src2','src3'])) > 0
        """,
        "p5_entity_composition": """
            SELECT p_partkey,
                   p_name || '[ENT]' ||
                   CASE WHEN (CASE WHEN p_size < 5 THEN '' ELSE p_type END) = ''
                        THEN p_name || ' is an entity in this dictionary.'
                        ELSE p_type END AS enc_text
            FROM part
        """,
        "p6_dict_lookup": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "p7_surface_slice": """
            SELECT doc_id, substr(text, n_chars % 20 + 1, 10) AS surface
            FROM documents
        """,
        "blocking_keys": """
            SELECT lang, string_split(text, ' ')[1] AS block_key, count(*) AS block_n
            FROM documents GROUP BY 1, 2 HAVING count(*) > 1
        """,
        "block_pairs_lev": """
            WITH d AS (SELECT doc_id, lang, string_split(text,' ')[1] AS bk,
                              substr(text,1,30) AS head FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b, levenshtein(a.head, b.head) AS lev
            FROM d a JOIN d b ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
        """,
        "jw_pair_scores": """
            WITH d AS (SELECT doc_id, lang, string_split(text,' ')[1] AS bk,
                              substr(text,1,30) AS head FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(jaro_winkler_similarity(a.head, b.head), 6) AS jw
            FROM d a JOIN d b ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
        """,
        "knn_top5": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            scored AS (
              SELECT q_id, c_id, dot / (nq.nrm * nc.nrm) AS cos
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id),
            ranked AS (
              SELECT q_id, c_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
              FROM scored)
            SELECT q_id AS vec_id, c_id AS hit_id, rank
            FROM ranked WHERE rank <= 5
        """,
        "recall_mrr": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id < 100 AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            ranked AS (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rank
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id),
            gold AS (SELECT q.vec_id q_id, c.vec_id c_id
                     FROM embeddings q JOIN embeddings c ON q.label = c.label
                     WHERE q.vec_id < 100 AND q.vec_id <> c.vec_id),
            best AS (
              SELECT g.q_id, min(r.rank) AS best_rank
              FROM gold g LEFT JOIN ranked r ON r.q_id = g.q_id AND r.c_id = g.c_id
                                             AND r.rank <= 100
              GROUP BY 1),
            denom AS (SELECT count(DISTINCT vec_id) n FROM embeddings WHERE vec_id < 100)
            SELECT
              round(sum(CASE WHEN best_rank <= 1 THEN 1 ELSE 0 END) * 1.0 / (SELECT n FROM denom), 6) AS recall_1,
              round(sum(CASE WHEN best_rank <= 10 THEN 1 ELSE 0 END) * 1.0 / (SELECT n FROM denom), 6) AS recall_10,
              round(sum(CASE WHEN best_rank <= 50 THEN 1 ELSE 0 END) * 1.0 / (SELECT n FROM denom), 6) AS recall_50,
              round(sum(CASE WHEN best_rank <= 100 THEN 1 ELSE 0 END) * 1.0 / (SELECT n FROM denom), 6) AS recall_100,
              round(sum(coalesce(1.0 / best_rank, 0)) / (SELECT n FROM denom), 6) AS mrr
            FROM best
        """,
        "hard_negatives": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            ranked AS (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rank
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id),
            top100 AS (SELECT * FROM ranked WHERE rank <= 100),
            lbl AS (SELECT vec_id, label FROM embeddings),
            nongold AS (
              SELECT t.q_id, t.c_id, t.rank
              FROM top100 t JOIN lbl lq ON lq.vec_id = t.q_id
                            JOIN lbl lc ON lc.vec_id = t.c_id
              WHERE lq.label <> lc.label),
            rer AS (SELECT q_id, c_id,
                           row_number() OVER (PARTITION BY q_id ORDER BY rank) AS rank2
                    FROM nongold)
            SELECT q_id AS vec_id, c_id AS hit_id, rank2 AS rank FROM rer WHERE rank2 <= 10
        """,
        "mined_candidates": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            ranked AS (
              SELECT q_id, c_id,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rank
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id),
            gold AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
                     FROM embeddings q JOIN embeddings c ON q.label = c.label
                     WHERE q.vec_id < 50 AND q.vec_id % 2 = 0
                       AND q.vec_id <> c.vec_id),
            kp AS (SELECT 10 + coalesce(max(n), 1) AS k FROM
                     (SELECT q_id, count(*) AS n FROM gold GROUP BY 1)),
            top AS (SELECT * FROM ranked WHERE rank <= (SELECT k FROM kp)),
            cand AS (SELECT q_id,
                            list(CAST(c_id AS VARCHAR) ORDER BY rank) AS l
                     FROM top WHERE rank <= 10 GROUP BY 1),
            nong AS (SELECT t.q_id, t.c_id,
                            row_number() OVER (PARTITION BY t.q_id
                                               ORDER BY t.rank) AS rk2
                     FROM top t LEFT JOIN gold g
                       ON g.q_id = t.q_id AND g.c_id = t.c_id
                     WHERE g.c_id IS NULL),
            negs AS (SELECT q_id,
                            list(CAST(c_id AS VARCHAR) ORDER BY rk2) AS l
                     FROM nong WHERE rk2 <= 10 GROUP BY 1)
            SELECT s.vec_id AS mention_id,
                   CAST(coalesce(len(c.l), 0) AS INT) AS n_cand,
                   coalesce(array_to_string(c.l, ','), '') AS cand_csv,
                   CAST(coalesce(len(n.l), 0) AS INT) AS n_negs,
                   coalesce(array_to_string(n.l, ','), '') AS negs_csv
            FROM (SELECT vec_id FROM embeddings WHERE vec_id < 60) s
            LEFT JOIN cand c ON c.q_id = s.vec_id
            LEFT JOIN negs n ON n.q_id = s.vec_id
        """,
        "predictions_top5": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
              GROUP BY 1, 2),
            ranked AS (
              SELECT q_id, c_id, dot / (nq.nrm * nc.nrm) AS cos,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rank
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id),
            top AS (SELECT * FROM ranked WHERE rank <= 5)
            SELECT t.q_id AS mention_id,
                   CAST(t.rank AS INT) AS rank,
                   substr(d.text, 1, 12) AS name,
                   t.c_id AS id,
                   round(t.cos, 4) AS similarity,
                   CAST(length(substr(d.text, 1, 300)) AS INT) AS desc_len,
                   substr(substr(d.text, 1, 300), 290, 11) AS desc_tail
            FROM top t LEFT JOIN documents d ON d.doc_id = t.c_id
        """,
        "connected_components": """
            WITH RECURSIVE e AS (
              SELECT lpad(CAST(doc_id AS VARCHAR), 5, '0') AS a,
                     lpad(CAST(doc_id + n_chars % 5 + 1 AS VARCHAR), 5, '0') AS b
              FROM documents WHERE doc_id < 300),
            ce AS (SELECT least(a,b) a, greatest(a,b) b FROM e WHERE a <> b),
            nodes AS (SELECT a AS n FROM ce UNION SELECT b FROM ce),
            sym AS (SELECT a s, b d FROM ce UNION SELECT b, a FROM ce),
            walk(node, mn) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT s.d, w.mn FROM walk w JOIN sym s ON s.s = w.node)
            SELECT node AS member, min(mn) AS cluster_id FROM walk GROUP BY node
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_dups,
                   min(CAST(doc_id AS VARCHAR)) AS keep_id
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": """
            WITH s AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) id,
                              unnest(list_distinct(string_split(lower(text),' '))) AS sh
                       FROM documents WHERE doc_id < 60),
            s2 AS (SELECT * FROM s WHERE length(sh) > 0),
            sz AS (SELECT id, count(*) n FROM s2 GROUP BY 1),
            i AS (SELECT a.id x, b.id y, count(*) c
                  FROM s2 a JOIN s2 b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2)
            SELECT x AS a, y AS b,
                   round(c * 1.0 / (za.n + zb.n - c), 6) AS jaccard
            FROM i JOIN sz za ON za.id = i.x JOIN sz zb ON zb.id = i.y
            WHERE c * 1.0 / (za.n + zb.n - c) >= 0.7
        """,
        "dedup_decisions": """
            WITH ids AS (SELECT CAST(doc_id AS VARCHAR) id, md5(text) h
                         FROM documents WHERE doc_id < 60),
            em AS (SELECT h, min(id) keeper FROM ids GROUP BY h),
            exact AS (SELECT id, CASE WHEN id <> keeper THEN keeper END AS ep
                      FROM ids JOIN em USING (h)),
            s0 AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) id,
                          unnest(list_distinct(string_split(lower(text),' '))) AS sh
                   FROM documents WHERE doc_id < 60),
            s2 AS (SELECT * FROM s0 WHERE length(sh) > 0),
            sz AS (SELECT id, count(*) n FROM s2 GROUP BY 1),
            i AS (SELECT a.id x, b.id y, count(*) c
                  FROM s2 a JOIN s2 b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2),
            prs AS (SELECT x, y FROM i JOIN sz za ON za.id = i.x JOIN sz zb ON zb.id = i.y
                    WHERE c * 1.0 / (za.n + zb.n - c) >= 0.7),
            np AS (SELECT y AS id, min(x) AS npp FROM prs GROUP BY y)
            SELECT id,
                   CASE WHEN ep IS NOT NULL THEN 'drop_exact'
                        WHEN npp IS NOT NULL THEN 'drop_near'
                        ELSE 'keep' END AS action,
                   coalesce(ep, npp) AS partner
            FROM exact LEFT JOIN np USING (id)
        """,
        "minhash_signatures": """
            WITH toks AS (SELECT CAST(doc_id AS VARCHAR) id,
                                 string_split(lower(text), ' ') AS l
                          FROM documents WHERE doc_id < 100),
            sh AS (SELECT DISTINCT id,
                          array_to_string(l[i:i+2], ' ') AS shingle
                   FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(l) - 2, 1))) AS i)
                   WHERE length(array_to_string(l[i:i+2], ' ')) > 0),
            expanded AS (
              SELECT id, shingle, band, rw
              FROM sh,
                   LATERAL (SELECT unnest([0,1]) AS band),
                   LATERAL (SELECT unnest([0,1]) AS rw)),
            row_min AS (
              SELECT id, band, rw,
                     min(md5(band || ':' || rw || ':' || shingle)) AS mh
              FROM expanded GROUP BY 1, 2, 3)
            SELECT id, band, string_agg(mh, '-' ORDER BY rw) AS sig
            FROM row_min GROUP BY 1, 2
        """,
        "minhash_lsh_pairs": """
            WITH toks AS (SELECT CAST(doc_id AS VARCHAR) id,
                                 string_split(lower(text), ' ') AS l
                          FROM documents WHERE doc_id < 100),
            sh AS (SELECT DISTINCT id,
                          array_to_string(l[i:i+1], ' ') AS shingle
                   FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(l) - 1, 1))) AS i)
                   WHERE length(array_to_string(l[i:i+1], ' ')) > 0),
            expanded AS (
              SELECT id, shingle, band, rw
              FROM sh,
                   LATERAL (SELECT unnest([0,1]) AS band),
                   LATERAL (SELECT unnest([0]) AS rw)),
            row_min AS (
              SELECT id, band, rw,
                     min(md5(band || ':' || rw || ':' || shingle)) AS mh
              FROM expanded GROUP BY 1, 2, 3),
            sig AS (SELECT id, band, string_agg(mh, '-' ORDER BY rw) AS sig
                    FROM row_min GROUP BY 1, 2)
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM sig x JOIN sig y ON x.band = y.band AND x.sig = y.sig
            WHERE x.id < y.id
        """,
        "simhash": """
            WITH tok AS (SELECT CAST(doc_id AS VARCHAR) id,
                                unnest(string_split(lower(text),' ')) AS tok
                         FROM documents WHERE doc_id < 200),
            tok2 AS (SELECT * FROM tok WHERE length(tok) > 0),
            pos AS (SELECT id, tok, unnest(generate_series(1,16)) AS pos FROM tok2),
            votes AS (SELECT id, pos,
                             CASE WHEN substr(md5(tok), pos, 1) IN
                                  ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS v
                      FROM pos),
            per_bit AS (SELECT id, pos, sum(v) s FROM votes GROUP BY 1, 2)
            SELECT id, string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
            FROM per_bit GROUP BY id
        """,
        "embedding_neardup": """
            WITH uq AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) v,
                               generate_subscripts(embedding,1) i FROM embeddings),
            norms AS (SELECT vec_id, sqrt(sum(v*v)) nrm FROM uq GROUP BY 1),
            dots AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.v * c.v) AS dot
              FROM uq q JOIN uq c ON q.i = c.i
              WHERE q.vec_id <> c.vec_id GROUP BY 1, 2),
            scored AS (
              SELECT q_id, c_id, dot / (nq.nrm * nc.nrm) AS cos,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY dot / (nq.nrm * nc.nrm) DESC, c_id) AS rank
              FROM dots JOIN norms nq ON nq.vec_id = q_id
                        JOIN norms nc ON nc.vec_id = c_id)
            SELECT DISTINCT least(q_id, c_id) AS a, greatest(q_id, c_id) AS b
            FROM scored WHERE rank <= 5 AND cos >= 0.3
        """,
        "text_stats": """
            WITH base AS (
              SELECT doc_id, text,
                     ' ' || lower(text) || ' ' AS p,
                     CAST(len(regexp_split_to_array(trim(text), ' +')) AS INT) AS n_tokens
              FROM documents),
            occ AS (
              SELECT doc_id, text, n_tokens,
                CAST((length(p) - length(replace(p, ' the ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' and ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' of ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' to ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' a ', ''))) / 3 AS INT) AS en_n,
                CAST((length(p) - length(replace(p, ' der ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' die ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' und ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' das ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' ist ', ''))) / 5 AS INT) AS de_n,
                CAST((length(p) - length(replace(p, ' le ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' la ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' et ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' les ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' des ', ''))) / 5 AS INT) AS fr_n,
                CAST((length(p) - length(replace(p, ' el ', ''))) / 4 AS INT)
                + CAST((length(p) - length(replace(p, ' los ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' que ', ''))) / 5 AS INT)
                + CAST((length(p) - length(replace(p, ' y ', ''))) / 3 AS INT)
                + CAST((length(p) - length(replace(p, ' en ', ''))) / 4 AS INT) AS es_n
              FROM base),
            scored AS (
              SELECT doc_id, text, n_tokens, en_n,
                     (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) AS punct_marks,
                     (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                       * 1.0 / greatest(length(text), 1) AS punct_density,
                     en_n * 1.0 / greatest(n_tokens, 1) AS sw_ratio,
                     greatest(
                       lpad(CAST(en_n AS VARCHAR), 6, '0') || 'en',
                       lpad(CAST(de_n AS VARCHAR), 6, '0') || 'de',
                       lpad(CAST(fr_n AS VARCHAR), 6, '0') || 'fr',
                       lpad(CAST(es_n AS VARCHAR), 6, '0') || 'es') AS bestk
              FROM occ)
            SELECT doc_id,
                   n_tokens,
                   CAST(n_tokens + punct_marks AS INT) AS n_units,
                   round(sw_ratio, 6) AS stopword_ratio,
                   round(0.4 * least(n_tokens / 100.0, 1.0)
                         + 0.3 * least(sw_ratio * 5.0, 1.0)
                         + 0.3 * (1.0 - punct_density), 6) AS quality,
                   CASE WHEN substr(bestk, 1, 6) = '000000' THEN 'und'
                        ELSE substr(bestk, 7) END AS lang_pred
            FROM scored
        """,
        "fingerprint": """
            WITH tok AS (SELECT CAST(doc_id AS VARCHAR) id,
                                unnest(string_split(lower(text),' ')) AS tok,
                                generate_subscripts(string_split(lower(text),' '),1) - 1 AS pos
                         FROM documents),
            led AS (SELECT id, pos, tok,
                           lead(tok,1) OVER w t1, lead(tok,2) OVER w t2,
                           lead(tok,3) OVER w t3, lead(tok,4) OVER w t4,
                           max(pos) OVER (PARTITION BY id) AS maxpos
                    FROM tok WINDOW w AS (PARTITION BY id ORDER BY pos)),
            sh AS (SELECT id, concat_ws(' ', tok, t1, t2, t3, t4) AS sh
                   FROM led WHERE t4 IS NOT NULL OR (pos = 0 AND maxpos < 4))
            SELECT id, min(md5(sh)) AS fingerprint FROM sh GROUP BY id
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            WITH agg AS (
              SELECT l_orderkey, o_orderdate,
                     sum(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS rev
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < '1998-03-15' AND l_shipdate > '1995-03-15'
              GROUP BY l_orderkey, o_orderdate
              ORDER BY rev DESC, l_orderkey LIMIT 10)
            SELECT l_orderkey, o_orderdate,
                   round(CAST(rev AS DOUBLE), 2) AS revenue
            FROM agg
        """,
        "events_window": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
                   count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "inbatch_scoring": """
            WITH ranked AS (
              SELECT vec_id, label, embedding,
                     row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rk
              FROM embeddings),
            gold AS (SELECT label, embedding AS gemb FROM ranked WHERE rk = 1),
            ment AS (SELECT vec_id, label, embedding AS memb FROM ranked WHERE rk = 2),
            rows_ AS (
              SELECT CAST(m.label % 4 AS VARCHAR) AS batch_id, m.label,
                     lpad(CAST(m.vec_id AS VARCHAR), 8, '0') AS rid,
                     m.memb, g.gemb
              FROM ment m JOIN gold g ON m.label = g.label),
            pos AS (SELECT batch_id, label, memb, gemb,
                           row_number() OVER (PARTITION BY batch_id ORDER BY rid) AS i
                    FROM rows_),
            mu AS (SELECT batch_id, i, CAST(unnest(memb) AS DOUBLE) v,
                          generate_subscripts(memb, 1) d FROM pos),
            gu AS (SELECT batch_id, i AS j, CAST(unnest(gemb) AS DOUBLE) v,
                          generate_subscripts(gemb, 1) d FROM pos),
            -- each mention's OWN hard negatives: its label's 3rd/4th
            -- vectors, as extra columns j = 100000+h (h = 1, 2) of row i
            negs AS (SELECT p.batch_id, p.i, r.rk - 2 AS h, r.embedding AS nemb
                     FROM pos p JOIN ranked r ON r.label = p.label
                     WHERE r.rk IN (3, 4)),
            nu AS (SELECT batch_id, i, 100000 + h AS j,
                          CAST(unnest(nemb) AS DOUBLE) v,
                          generate_subscripts(nemb, 1) d FROM negs),
            gdots AS (
              SELECT mu.batch_id, mu.i, gu.j, sum(mu.v * gu.v) / 0.1 AS z
              FROM mu JOIN gu ON mu.batch_id = gu.batch_id AND mu.d = gu.d
              GROUP BY 1, 2, 3),
            ndots AS (
              SELECT mu.batch_id, mu.i, nu.j, sum(mu.v * nu.v) / 0.1 AS z
              FROM mu JOIN nu ON nu.batch_id = mu.batch_id AND nu.i = mu.i
                             AND nu.d = mu.d
              GROUP BY 1, 2, 3),
            dots AS (SELECT * FROM gdots UNION ALL SELECT * FROM ndots),
            mx AS (SELECT batch_id, i, max(z) AS m, arg_max(j, z) AS am
                   FROM dots GROUP BY 1, 2),
            lse AS (SELECT d.batch_id, d.i, ln(sum(exp(d.z - mx.m))) + mx.m AS l,
                           any_value(mx.am) AS am
                    FROM dots d JOIN mx ON mx.batch_id = d.batch_id AND mx.i = d.i
                    GROUP BY d.batch_id, d.i, mx.m),
            diag AS (SELECT batch_id, i, z FROM gdots WHERE i = j)
            SELECT l.batch_id,
                   round(avg(l.l - diag.z), 6) AS loss,
                   round(avg(CASE WHEN l.am = l.i THEN 1.0 ELSE 0.0 END), 6) AS recall,
                   CAST(count(*) AS INT) AS n_mentions,
                   2 AS n_negatives
            FROM lse l JOIN diag ON diag.batch_id = l.batch_id AND diag.i = l.i
            GROUP BY l.batch_id
        """,
        "events_sessionize": """
            WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs FROM events),
            g AS (SELECT user_id, secs,
                         CASE WHEN secs - lag(secs) OVER (PARTITION BY user_id ORDER BY secs) > 1800
                              THEN 1
                              WHEN lag(secs) OVER (PARTITION BY user_id ORDER BY secs) IS NULL
                              THEN 1 ELSE 0 END AS new_s
                  FROM e)
            SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions FROM g GROUP BY user_id
        """,
    }
