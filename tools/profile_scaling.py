"""Per-stage scaling profile of the full linkage pipeline.

Runs the bench pipeline at a list of local[N] levels (each in a fresh
subprocess / JVM, same pre-generated corpus, warmed page cache) with
``link(verbose=True)`` so each stage's wall time is recorded.  Output is
one JSON line per level:

    {"cpus": N, "total_sec": ..., "stages": {"mentions": ..., ...}}

Usage:
    python tools/profile_scaling.py 4 8 16 32 [--pages 60000]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leg(cpus: int, pages: int) -> None:
    import bench
    from mix_blink_spark.plans.pipeline import LinkConfig, link
    from pyspark.sql import functions as F

    spark = bench._session(cpus)
    bench._prepare_corpus(spark, bench.WARM_PAGES)
    bench._run_er(spark, bench.WARM_PAGES)
    bench._prepare_corpus(spark, pages)
    bench._warm_page_cache(bench._corpus_path(pages))

    path = bench._corpus_path(pages)
    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    ents = spark.read.parquet(os.path.join(path, "entities"))
    pages_df = corpus.select("url", "warc_ts", "html", "lang")
    spans = corpus.select("url", F.explode("mentions").alias("m")).select(
        "url", "m.mention_id", "m.start", "m.end"
    )
    t0 = time.monotonic()
    out = link(spark, pages_df, spans, ents, LinkConfig(me_max_block_size=200), verbose=True)
    out["clusters"].count()
    print(json.dumps({"leg_total_sec": round(time.monotonic() - t0, 2)}))
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), int(sys.argv[3]))
        return
    pages = 60000
    levels = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--pages":
            pages = int(args[i + 1])
            i += 2
        else:
            levels.append(int(args[i]))
            i += 1
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(cpus), str(pages)],
            capture_output=True,
            text=True,
            env=os.environ.copy(),
        )
        stages: dict[str, float] = {}
        total = None
        for line in proc.stdout.splitlines():
            m = re.match(r"\[link\] (?:stage )?(.+?): ([0-9.]+)s", line.strip())
            if m:
                stages[m.group(1)] = float(m.group(2))
            elif line.startswith("{"):
                try:
                    total = json.loads(line).get("leg_total_sec", total)
                except json.JSONDecodeError:
                    pass
        print(
            json.dumps(
                {"cpus": cpus, "pages": pages, "total_sec": total, "stages": stages}
            ),
            flush=True,
        )
        if total is None:
            print("STDERR TAIL:", proc.stderr[-3000:], file=sys.stderr)


if __name__ == "__main__":
    main()
