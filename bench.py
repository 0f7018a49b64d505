"""Benchmark job (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Also measures the north-rule scaling evidence unless SPARK_GRAFT_SCALING=0:
the CPU-bound ER linkage pipeline (encode + block + score + CC) runs at
local[8] and local[32] on the SAME generated corpus; reported as
docs_per_sec_8 / docs_per_sec_32 / scaling_efficiency = (thr32/thr8)/4.

Timings force full computation via .count() actions (results are never
collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_signatures",
    "simhash",
    "text_stats",
    "fingerprint",
    "knn_top5",
    "recall_mrr",
    "hard_negatives",
    "embedding_neardup",
    "connected_components",
    "block_pairs_lev",
    "jw_pair_scores",
    "tpch_q1",
    "tpch_q3",
    "events_window",
    "events_sessionize",
]

ER_PAGES = int(os.environ.get("SPARK_GRAFT_ER_PAGES", "12000"))
ER_ENTITIES = 300


def _session(cpus: int):
    from mix_blink_spark.session import get_spark

    return get_spark(
        app_name=f"mbs-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )


def _run_er(spark) -> tuple[float, int]:
    """Returns (elapsed_sec, n_pages). Corpus generation + caching excluded
    from timing (input prep, not pipeline work)."""
    from pyspark.sql import functions as F

    from mix_blink_spark.fixtures import corpus_dfs
    from mix_blink_spark.plans.pipeline import LinkConfig, link

    pages, ents, golds, _ = corpus_dfs(spark, seed=11, n_pages=ER_PAGES, n_entities=ER_ENTITIES)
    pages = pages.repartition(spark.sparkContext.defaultParallelism).cache()
    ents = ents.cache()
    spans = golds.select("url", "mention_id", "start", "end").cache()
    pages.count(), ents.count(), spans.count()

    t0 = time.monotonic()
    out = link(spark, pages, spans, ents, LinkConfig())
    out["clusters"].count()
    elapsed = time.monotonic() - t0
    for df in (pages, ents, spans):
        df.unpersist()
    return elapsed, ER_PAGES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = _session(cpus)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)

    er_sec, er_pages = _run_er(spark)
    timings["er_pipeline"] = round(er_sec, 3)
    docs_per_sec = er_pages / er_sec

    result = {
        "metric": "total_bench_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "er_pages": er_pages,
        "docs_per_sec": round(docs_per_sec, 1),
    }

    if do_scaling:
        spark.stop()
        lo_cpus, hi_cpus = 8, 32
        spark_lo = _session(lo_cpus)
        sec_lo, _ = _run_er(spark_lo)
        spark_lo.stop()
        spark_hi = _session(hi_cpus)
        sec_hi, _ = _run_er(spark_hi)
        spark_hi.stop()
        thr_lo = er_pages / sec_lo
        thr_hi = er_pages / sec_hi
        result.update(
            {
                "docs_per_sec_8": round(thr_lo, 1),
                "docs_per_sec_32": round(thr_hi, 1),
                "scaling_efficiency": round((thr_hi / thr_lo) / (hi_cpus / lo_cpus), 3),
            }
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
