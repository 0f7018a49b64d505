"""Decompose the ER leg's "surfaces materialize" stage with noop sinks
(guide §1.4): pages scan+extract alone, spans scan alone, joined mentions,
then the full distinct-surfaces count the leg actually pays.

Usage: python tools/profile_surfaces.py [cpus]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from mix_blink_spark.functions.text import blocking_key, normalize_surface
from mix_blink_spark.sources.pages import read_pages_extracted_python


def t(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic() - t0:.2f}s", flush=True)
    return out


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = bench._session(cpus)
    path = bench._corpus_path(bench.ER_PAGES)
    corpus_p = os.path.join(path, "corpus")
    bench._warm_page_cache(path)
    # small warmup like the probe leg
    bench._prepare_corpus(spark, bench.WARM_PAGES)
    bench._run_er(spark, bench.WARM_PAGES)

    corpus = spark.read.parquet(corpus_p)
    dp = spark.sparkContext.defaultParallelism
    slots = int(os.environ.get("SPARK_GRAFT_SCAN_SLOTS", "16"))

    def pages_df():
        p = read_pages_extracted_python(spark, corpus_p, columns=("url", "lang"))
        if slots and dp > slots:
            p = p.coalesce(slots)
        return p

    spark.sparkContext.setJobDescription("spans scan noop")
    t("spans scan (url+mentions explode, noop)", lambda: (
        corpus.select("url", F.explode("mentions").alias("m"))
        .select("url", "m.mention_id", "m.start", "m.end")
        .write.format("noop").mode("overwrite").save()
    ))
    spark.sparkContext.setJobDescription("pages scan+extract noop")
    t("pages scan+extract (noop)", lambda: (
        pages_df().write.format("noop").mode("overwrite").save()
    ))
    spark.sparkContext.setJobDescription("mentions join noop")
    spans = corpus.select("url", F.explode("mentions").alias("m")).select(
        "url", "m.mention_id", "m.start", "m.end"
    )
    from mix_blink_spark.sources.pages import mentions_from_spans

    t("mentions join (noop, full rows)", lambda: (
        mentions_from_spans(pages_df(), spans, broadcast_spans=True)
        .write.format("noop").mode("overwrite").save()
    ))
    t("surfaces distinct count (leg shape)", lambda: (
        mentions_from_spans(pages_df(), spans, broadcast_spans=True)
        .select("mention_id", "norm")
        .select("norm").filter(F.length("norm") > 0).distinct().count()
    ))
    spark.stop()


if __name__ == "__main__":
    main()
