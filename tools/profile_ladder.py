"""Within-session, interleaved concurrency ladder for the scan and
scan+extract kernels.

Motivation: single-shot per-level probes on this shared-host microVM are
polluted by minute-scale host drift (measured: the same scan+extract work
ran 25.2 s and then 9.0 s two minutes apart in ONE session). This tool
holds the JVM, session config, and input constant (one local[32] session)
and controls *task concurrency* by coalescing the scan to p partitions, so
every level runs under identical session state; levels are interleaved
round-robin and the per-level MEDIAN over repeats is reported.

Usage: python tools/profile_ladder.py [--pages 60000] [--reps 3] [p ...]
Output: one JSON line {"pages":..., "levels":{p: {"scan": s, "extract": s}}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from mix_blink_spark.session import get_spark
    from mix_blink_spark.sources.pages import with_extracted_text

    pages_n, reps = 60000, 3
    levels: list[int] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--pages":
            pages_n = int(args[i + 1]); i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            levels.append(int(args[i])); i += 1
    if not levels:
        levels = [4, 8, 16, 32]

    spark = get_spark(app_name="ladder", master="local[32]", shuffle_partitions=64)
    bench._prepare_corpus(spark, pages_n)
    path = bench._corpus_path(pages_n)
    bench._warm_page_cache(path)

    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    pages = corpus.select("url", "warc_ts", "html", "lang")

    def cpu_jiffies() -> tuple[int, int]:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # (user+nice, system) box-wide
        return int(parts[1]) + int(parts[2]), int(parts[3])

    sys_pct: list[float] = []  # box-wide sys share during each measurement

    def timed(fn) -> float:
        u0, s0 = cpu_jiffies()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        u1, s1 = cpu_jiffies()
        du, ds = u1 - u0, s1 - s0
        sys_pct.append(ds / max(du + ds, 1))
        return dt

    def scan_at(p: int) -> float:
        return timed(
            lambda: pages.coalesce(p).select(F.sum(F.length("html"))).collect()
        )

    def extract_at(p: int) -> float:
        ext = with_extracted_text(pages.coalesce(p)).select(
            F.col("extracted_text").alias("text")
        )
        return timed(lambda: ext.select(F.sum(F.length("text"))).collect())

    # warm-up: one small pass per kernel (codegen, Python worker pool)
    scan_at(32)
    extract_at(32)

    runs: dict[int, dict[str, list[float]]] = {
        p: {"scan": [], "extract": [], "scan_sys": [], "extract_sys": []}
        for p in levels
    }
    for _ in range(reps):
        for p in levels:
            runs[p]["scan"].append(scan_at(p))
            runs[p]["scan_sys"].append(sys_pct[-1])
        for p in levels:
            runs[p]["extract"].append(extract_at(p))
            runs[p]["extract_sys"].append(sys_pct[-1])

    out = {
        "pages": pages_n,
        "reps": reps,
        "levels": {
            str(p): {
                "scan": round(statistics.median(r["scan"]), 2),
                "scan_all": [round(x, 1) for x in r["scan"]],
                "scan_sys_pct": round(100 * statistics.median(r["scan_sys"]), 1),
                "extract": round(statistics.median(r["extract"]), 2),
                "extract_all": [round(x, 1) for x in r["extract"]],
                "extract_sys_pct": round(100 * statistics.median(r["extract_sys"]), 1),
            }
            for p, r in runs.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
