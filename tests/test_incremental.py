"""Append-increment processing: watermark advance, delta-only linking,
cross-batch cluster merge, durable data-then-watermark commits."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mix_blink_spark.fixtures import corpus_dfs
from mix_blink_spark.operators.metrics import cluster_pairs, pairwise_prf
from mix_blink_spark.plans.pipeline import link
from mix_blink_spark.streaming.incremental import IncrementalStore, process_increment


def _split_by_ts(pages):
    ts_sorted = [r["warc_ts"] for r in pages.select("warc_ts").orderBy("warc_ts").collect()]
    cutoff = ts_sorted[len(ts_sorted) // 2]
    return pages.filter(F.col("warc_ts") <= F.lit(cutoff)), cutoff


def test_incremental_two_batches(spark, corpus, tmp_path):
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")

    first, _ = _split_by_ts(pages)
    store = IncrementalStore(spark, str(tmp_path / "state"))

    a1 = process_increment(spark, first, spans, ents, store)
    n1 = a1.count()
    assert n1 > 0
    assert store.watermark() is not None

    # second call with the FULL table only processes the newer half
    a2 = process_increment(spark, pages, spans, ents, store)
    members = {r["member"] for r in a2.select("member").distinct().collect()}
    all_mentions = {r["mention_id"] for r in spans.collect()}
    assert members >= all_mentions  # every mention assigned exactly once
    assert a2.count() == a2.select("member").distinct().count()

    # idempotent third call: nothing newer than watermark
    a3 = process_increment(spark, pages, spans, ents, store)
    assert a3.count() == a2.count()


def test_incremental_matches_oneshot_f1(spark, corpus, tmp_path):
    """The cross-batch merge promise: splitting the corpus into two
    increments yields the same pairwise F1 as a one-shot run — clusters
    whose members arrive in different batches are merged via shared nodes
    and near-miss cross-batch scoring, not fragmented."""
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    labeled = corpus["labeled_pairs"]
    spans = golds.select("url", "mention_id", "start", "end")

    one_shot = link(spark, pages, spans, ents)
    prf_one = pairwise_prf(cluster_pairs(one_shot["clusters"]), labeled)

    first, _ = _split_by_ts(pages)
    store = IncrementalStore(spark, str(tmp_path / "state"))
    process_increment(spark, first, spans, ents, store)
    merged = process_increment(spark, pages, spans, ents, store)
    prf_inc = pairwise_prf(cluster_pairs(merged), labeled)

    assert prf_inc["f1"] >= 0.99
    assert abs(prf_inc["f1"] - prf_one["f1"]) < 1e-9, (prf_inc, prf_one)


def test_commit_is_data_then_watermark(spark, corpus, tmp_path):
    """Crash protocol: the watermark only ever points at fully-written
    parquet. A half-written NEXT version (crash between data write and
    watermark advance) is invisible to readers and overwritten on retry."""
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")

    first, _ = _split_by_ts(pages)
    sdir = str(tmp_path / "state")
    store = IncrementalStore(spark, sdir)
    a1 = process_increment(spark, first, spans, ents, store)
    meta = json.load(open(os.path.join(sdir, "watermark.json")))
    vdir = os.path.join(sdir, f"v{meta['version']}")
    assert os.path.exists(os.path.join(vdir, "assignment", "_SUCCESS"))
    assert os.path.exists(os.path.join(vdir, "nodes", "_SUCCESS"))

    # simulate a crash: garbage next-version dir, watermark NOT advanced
    crash_dir = os.path.join(sdir, f"v{meta['version'] + 1}", "assignment")
    os.makedirs(crash_dir, exist_ok=True)
    open(os.path.join(crash_dir, "part-garbage"), "w").write("junk")

    # retry processes the same delta again and overwrites the garbage
    a2 = process_increment(spark, pages, spans, ents, store)
    meta2 = json.load(open(os.path.join(sdir, "watermark.json")))
    assert meta2["version"] == meta["version"] + 1
    assert a2.count() >= a1.count()
    # committed state is readable parquet, not the junk file
    assert store.assignment().count() == a2.count()


def test_compaction_prunes_and_crash_mid_compact_resolves(spark, corpus, tmp_path):
    """Retention prunes v<N dirs after each commit; a crash mid-compaction
    (simulated as a partially-deleted stale dir) is invisible to readers,
    which resolve only through the watermark, and the next sweep finishes
    the cleanup."""
    import shutil

    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")

    first, _ = _split_by_ts(pages)
    store = IncrementalStore(spark, str(tmp_path / "state"), retention=1)

    process_increment(spark, first, spans, ents, store)
    assert os.path.isdir(str(tmp_path / "state" / "v1"))

    a2 = process_increment(spark, pages, spans, ents, store)
    n2 = a2.count()
    # retention=1: v1 pruned automatically after v2's watermark advance
    assert not os.path.exists(str(tmp_path / "state" / "v1"))
    assert os.path.isdir(str(tmp_path / "state" / "v2"))

    # crash mid-compaction: a stale dir survives half-deleted — readers
    # never resolve it; an explicit sweep collects it
    stale = tmp_path / "state" / "v1"
    shutil.copytree(str(tmp_path / "state" / "v2"), str(stale))
    for f in list((stale / "assignment").iterdir())[:1]:
        f.unlink()
    assert store.assignment().count() == n2  # still reads v2
    assert store.compact(keep=1) == [1]
    assert not os.path.exists(str(stale))

    # watermark's own version is never a deletion candidate
    assert store.compact(keep=1) == []
    assert store.assignment().count() == n2
