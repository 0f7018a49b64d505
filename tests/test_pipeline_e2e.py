"""End-to-end pipeline: pairwise F1 ≥ 0.99 on the labeled-pairs oracle
(the north_rule headline metric) + resume-from-checkpoint."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mix_blink_spark.fixtures import corpus_dfs
from mix_blink_spark.operators.metrics import cluster_pairs, pairwise_prf
from mix_blink_spark.plans.pipeline import LinkConfig, link
from mix_blink_spark.plans.resume import StageStore


@pytest.fixture(scope="module")
def e2e(spark):
    pages, ents, golds, labeled = corpus_dfs(spark, seed=7, n_pages=1500, n_entities=80)
    for df in (pages, ents, golds, labeled):
        df.cache().count()
    return pages, ents, golds, labeled


def _f1(spark, pages, ents, golds, labeled, store=None):
    spans = golds.select("url", "mention_id", "start", "end")
    out = link(spark, pages, spans, ents, LinkConfig(), store=store)
    pred = cluster_pairs(out["clusters"].select("member", "cluster_id"))
    return pairwise_prf(pred, labeled), out


def test_pairwise_f1_target(spark, e2e):
    pages, ents, golds, labeled = e2e
    res, out = _f1(spark, pages, ents, golds, labeled)
    print("PRF:", res)
    assert res["recall"] >= 0.99, res
    assert res["precision"] >= 0.99, res
    assert res["f1"] >= 0.99, res


def test_surface_extraction_matches_gold(spark, e2e):
    """P7 substring slicing must reproduce the generator's surfaces."""
    pages, ents, golds, _ = e2e
    spans = golds.select("url", "mention_id", "start", "end")
    from mix_blink_spark.plans.pipeline import build_mentions

    m = build_mentions(pages, spans)
    bad = (
        m.join(golds.select("mention_id", F.col("surface").alias("gold_surface")), "mention_id")
        .filter(F.col("surface") != F.col("gold_surface"))
        .count()
    )
    assert bad == 0


def test_pairwise_f1_generalizes_to_other_seed(spark):
    """Thresholds must not be overfit to the primary fixture seed."""
    from mix_blink_spark.fixtures import corpus_dfs

    pages, ents, golds, labeled = corpus_dfs(spark, seed=13, n_pages=800, n_entities=50)
    spans = golds.select("url", "mention_id", "start", "end")
    out = link(spark, pages, spans, ents, LinkConfig())
    res = pairwise_prf(cluster_pairs(out["clusters"]), labeled)
    assert res["f1"] >= 0.99, res


def test_link_config_measure_contract():
    with pytest.raises(NotImplementedError, match="dot is not supported"):
        LinkConfig(measure="dot")


@pytest.mark.parametrize("measure", ["ip", "l2"])
def test_pipeline_other_measures_smoke(spark, measure):
    """ip and l2 paths run end-to-end and still cluster exact variants."""
    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.operators.metrics import cluster_pairs, pairwise_prf

    pages, ents, golds, labeled = corpus_dfs(spark, seed=3, n_pages=300, n_entities=25)
    spans = golds.select("url", "mention_id", "start", "end")
    out = link(spark, pages, spans, ents, LinkConfig(measure=measure))
    res = pairwise_prf(cluster_pairs(out["clusters"]), labeled)
    assert res["f1"] >= 0.9, res


def test_resume_skips_completed_stages(spark, e2e, tmp_path):
    pages, ents, golds, labeled = e2e
    workdir = str(tmp_path / "stages")
    store = StageStore(spark, workdir)
    res1, _ = _f1(spark, pages, ents, golds, labeled, store=store)
    assert store.is_done("mentions") and store.is_done("clusters")

    # resume: mark one stage dirty; earlier stages must NOT recompute
    mentions_mark = os.path.getmtime(os.path.join(workdir, "mentions.watermark.json"))
    store.reset("clusters")
    res2, _ = _f1(spark, pages, ents, golds, labeled, store=store)
    assert os.path.getmtime(os.path.join(workdir, "mentions.watermark.json")) == mentions_mark
    assert res2["f1"] == pytest.approx(res1["f1"])

    # per-partition lineage metrics recorded for every stage
    stages = {r["stage"] for r in store.metrics().select("stage").distinct().collect()}
    assert {"mentions", "pairs_mm", "pairs_me", "edges", "clusters"} <= stages

    # score-distribution histograms recorded for the scoring stages
    hist = store.histograms()
    hstages = {r["stage"] for r in hist.select("stage").distinct().collect()}
    assert {"pairs_mm", "pairs_me"} <= hstages
    total = hist.filter(F.col("stage") == "pairs_mm").agg(F.sum("rows")).first()[0]
    assert total == store.run("pairs_mm", lambda: None).count()


def test_local_pairs_parity_with_distributed(spark, e2e):
    """The driver-local pairs fast path (operators.localpairs, engaged at
    dimension scale) must produce EXACTLY the distributed plan's pairs —
    same (a, b) sets, bit-identical scores — and the same final clusters.
    max_block_size/me cap are forced low so BOTH the all-pairs and the
    sorted-neighborhood/insertion-window branches execute in each engine."""
    pages, ents, golds, labeled = e2e
    spans = golds.select("url", "mention_id", "start", "end")

    def run(limit):
        cfg = LinkConfig(max_block_size=12, me_max_block_size=30, neighborhood=4,
                         driver_pairs_limit=limit)
        out = link(spark, pages, spans, ents, cfg)
        mm = {(r["a"], r["b"]): (r["dense"], r["jw"], r["lev"], r["score"])
              for r in out["pairs_mm"].collect()}
        me = {(r["a"], r["b"]): (r["dense"], r["jw"], r["lev"], r["score"])
              for r in out["pairs_me"].collect()}
        cl = {(r["member"], r["cluster_id"]) for r in out["clusters"].collect()}
        return mm, me, cl

    mm_l, me_l, cl_l = run(50_000)   # local path (dimension-scale corpus)
    mm_d, me_d, cl_d = run(0)        # distributed path forced

    assert set(mm_l) == set(mm_d)
    assert set(me_l) == set(me_d)
    for k in mm_l:
        assert mm_l[k] == mm_d[k], (k, mm_l[k], mm_d[k])
    for k in me_l:
        assert me_l[k] == me_d[k], (k, me_l[k], me_d[k])
    assert cl_l == cl_d


def test_empty_norm_mentions_are_singletons(spark):
    """Mentions whose normalized surface is empty (punctuation-only) OR
    NULL (a NULL span offset makes the substring NULL) must come out as
    their own singleton clusters in BOTH regimes — the projection's
    null-side fallback (round 5: single left-join pass) plus the
    NULL→'' fold in mentions_from_spans (round-5 ADVICE)."""
    from mix_blink_spark.functions.text import extract_text_str

    html = b"<html><body>Acme Corp ... !!! ... Acme Corp</body></html>"
    text = extract_text_str(html.decode())
    spans_py = []
    for i, (tok, mid) in enumerate(
        [("Acme Corp", "m_a1"), ("!!!", "m_punct"), ("Acme Corp", "m_a2")]
    ):
        start = text.find(tok, 0 if i < 2 else text.find(tok) + 1)
        spans_py.append(("u1", mid, start, start + len(tok)))
    assert all(s[2] >= 0 for s in spans_py), (text, spans_py)
    spans_py.append(("u1", "m_null", 0, None))  # NULL end -> NULL surface/norm

    pages = spark.createDataFrame(
        [("u1", bytearray(html), "en")], "url string, html binary, lang string"
    )
    spans = spark.createDataFrame(
        spans_py, "url string, mention_id string, start int, end int"
    )
    ents = spark.createDataFrame(
        [("e1", "Acme Corp", ["Acme Corporation"], "maker of anvils")],
        "id string, name string, aliases array<string>, description string",
    )
    for limit in (50_000, 0):  # driver-local regime, then distributed
        out = link(spark, pages, spans, ents, LinkConfig(driver_pairs_limit=limit))
        cl = {r["member"]: r["cluster_id"] for r in out["clusters"].collect()}
        assert cl["m_punct"] == "m_punct", (limit, cl)
        assert cl["m_null"] == "m_null", (limit, cl)
        assert cl["m_a1"] == cl["m_a2"], (limit, cl)
        assert len(cl) == 4, (limit, cl)


def test_link_parquet_path_parity(spark, tmp_path):
    """link() accepts a parquet PATH for pages (the python-direct scan —
    the fast plan every parquet-backed caller should get without reading
    bench.py) and produces exactly the DataFrame plan's clusters."""
    from mix_blink_spark.fixtures import corpus_dfs

    pages, ents, golds, _ = corpus_dfs(spark, seed=5, n_pages=250, n_entities=20)
    spans = golds.select("url", "mention_id", "start", "end")
    pq_dir = str(tmp_path / "pages_pq")
    pages.write.mode("overwrite").parquet(pq_dir)

    out_df = link(spark, pages, spans, ents, LinkConfig())
    out_path = link(spark, pq_dir, spans, ents, LinkConfig())
    cl_df = {(r["member"], r["cluster_id"]) for r in out_df["clusters"].collect()}
    cl_path = {(r["member"], r["cluster_id"]) for r in out_path["clusters"].collect()}
    assert cl_df == cl_path and len(cl_df) > 0

    # jvm_extract is the JVM plan; combining it with a path input is a
    # contradiction and must refuse, not silently fall back
    with pytest.raises(ValueError, match="python-direct"):
        link(spark, pq_dir, spans, ents, LinkConfig(jvm_extract=True))


def test_rowemb_fused_parity_beyond_broadcast(spark, monkeypatch):
    """broadcast_dense_limit=0 forces the join-the-vectors (row-embedding)
    scoring plan — the beyond-broadcast vocabulary regime. Its fused
    reduction must produce exactly the window plan's me pairs, which must
    also equal the broadcast-matrix branch's."""
    from mix_blink_spark.fixtures import corpus_dfs

    pages, ents, golds, _ = corpus_dfs(spark, seed=23, n_pages=250, n_entities=20)
    spans = golds.select("url", "mention_id", "start", "end")

    def run(limit, plan):
        monkeypatch.setenv("SPARK_GRAFT_ME_PLAN", plan)
        cfg = LinkConfig(driver_pairs_limit=0, broadcast_dense_limit=limit)
        out = link(spark, pages, spans, ents, cfg)
        return {(r["a"], r["b"]): (r["dense"], r["jw"], r["lev"], r["score"])
                for r in out["pairs_me"].collect()}

    rowemb_fused = run(0, "fused")
    rowemb_window = run(0, "window")
    bc_fused = run(500_000, "fused")
    assert rowemb_fused == rowemb_window
    assert rowemb_fused == bc_fused
    assert len(rowemb_fused) > 0


def test_mm_dedup_knob_cluster_parity(spark, monkeypatch):
    """SPARK_GRAFT_MM_DEDUP=0 skips the mm side's global per-(a, b)
    dropDuplicates (a full shuffle of the pair set). Duplicate pairs score
    identically and the edge set is distinct()ed inside
    connected_components, so clusters must be invariant; the undeduped
    pair set must equal the deduped one AS A SET (a pair sharing k
    blocking keys appears k times), with bit-identical scores per key.
    Measured 1.36x duplicates / net-slower at local[8] in round 7
    (bench_artifacts/highvocab_r7.json) — the knob stays for cluster-scale
    re-evaluation, and this test pins its correctness contract."""
    from mix_blink_spark.fixtures import corpus_dfs

    pages, ents, golds, _ = corpus_dfs(spark, seed=17, n_pages=250, n_entities=20)
    spans = golds.select("url", "mention_id", "start", "end")

    def run(dedup_env):
        monkeypatch.setenv("SPARK_GRAFT_MM_DEDUP", dedup_env)
        # driver_pairs_limit=0 forces the distributed generators (the
        # knob only exists on the distributed mm path)
        cfg = LinkConfig(driver_pairs_limit=0, max_block_size=12, neighborhood=4)
        out = link(spark, pages, spans, ents, cfg)
        mm_rows = out["pairs_mm"].collect()
        mm = {(r["a"], r["b"]): (r["dense"], r["jw"], r["lev"], r["score"])
              for r in mm_rows}
        cl = {(r["member"], r["cluster_id"]) for r in out["clusters"].collect()}
        return mm, len(mm_rows), cl

    mm_d, n_d, cl_d = run("1")
    mm_r, n_r, cl_r = run("0")
    assert mm_d == mm_r            # same pair set, bit-identical scores
    assert n_r >= n_d              # raw rows may carry duplicates
    assert cl_d == cl_r            # clusters invariant
    assert len(cl_d) > 0
