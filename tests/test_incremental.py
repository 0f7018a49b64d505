"""Append-increment processing: watermark advance + delta-only linking."""

from __future__ import annotations

from pyspark.sql import functions as F

from mix_blink_spark.fixtures import corpus_dfs
from mix_blink_spark.streaming.incremental import Watermark, process_increment


def test_incremental_two_batches(spark, corpus, tmp_path):
    pages = corpus["pages"]
    golds = corpus["mentions_gold"]
    ents = corpus["entities"]
    spans = golds.select("url", "mention_id", "start", "end")

    ts_sorted = [r["warc_ts"] for r in pages.select("warc_ts").orderBy("warc_ts").collect()]
    cutoff = ts_sorted[len(ts_sorted) // 2]
    first = pages.filter(F.col("warc_ts") <= F.lit(cutoff))
    wm = Watermark(str(tmp_path / "wm.json"))

    a1 = process_increment(spark, first, spans, ents, None, wm)
    n1 = a1.count()
    assert n1 > 0
    assert wm.read() is not None

    # second call with the FULL table only processes the newer half
    a2 = process_increment(spark, pages, spans, ents, a1, wm)
    n2 = a2.count()
    total_mentions = spans.join(pages.select("url"), "url", "left_semi").count()
    # members from both batches present (surfaces may repeat across batches)
    assert n2 >= total_mentions * 0.9
    members = {r["member"] for r in a2.select("member").distinct().collect()}
    all_mentions = {r["mention_id"] for r in spans.collect()}
    assert members >= all_mentions - set()  # every mention assigned

    # idempotent third call: nothing newer than watermark
    a3 = process_increment(spark, pages, spans, ents, a2, wm)
    assert a3.count() == n2
