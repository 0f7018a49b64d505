"""Micro-profile of the scan+extract stage at one local[N] level.

Times, over the pre-generated bench corpus, in one fresh JVM:
  scan      — parquet scan + sum(length(html)) (no Python)
  extract   — scan + Python extraction pandas UDF + sum(length(text))
  mentions  — extract + spans join + surface slice + count
  surfaces  — mentions + distinct(norm) count  (the pipeline's stage)

Usage: python tools/profile_stage.py <cpus> <pages> [conf.k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    cpus = int(sys.argv[1])
    pages_n = int(sys.argv[2])
    extra = {}
    for a in sys.argv[3:]:
        k, v = a.split("=", 1)
        extra[k] = v

    from mix_blink_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
        extra_conf={
            "spark.speculation": "true",
            "spark.speculation.multiplier": "1.5",
            "spark.speculation.quantile": "0.75",
            "spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024),
            **extra,
        },
    )
    bench._prepare_corpus(spark, bench.WARM_PAGES)
    bench._run_er(spark, bench.WARM_PAGES)
    bench._prepare_corpus(spark, pages_n)
    bench._warm_page_cache(bench._corpus_path(pages_n))

    path = bench._corpus_path(pages_n)
    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    pages = corpus.select("url", "warc_ts", "html", "lang")
    spans = corpus.select("url", F.explode("mentions").alias("m")).select(
        "url", "m.mention_id", "m.start", "m.end"
    )

    out: dict[str, float] = {"cpus": cpus, "pages": pages_n}

    jvm = spark._jvm

    def gc_ms() -> int:
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    def timed(name: str, fn) -> None:
        g0, t0 = gc_ms(), time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 2)
        out[name + "_gc_s"] = round((gc_ms() - g0) / 1000.0, 2)

    if os.environ.get("PROFILE_STACKS"):
        import subprocess, threading

        jpid = subprocess.run(["jps"], capture_output=True, text=True).stdout
        pid = next(
            (l.split()[0] for l in jpid.splitlines() if "SparkSubmit" in l), None
        )

        def sampler():
            i = 0
            while not getattr(sampler, "stop", False):
                i += 1
                with open(f"/tmp/scan_stack_{i}.txt", "w") as fh:
                    subprocess.run(["jstack", pid], stdout=fh)
                time.sleep(5)

        th = threading.Thread(target=sampler, daemon=True)
        th.start()

    timed("scan", lambda: pages.select(F.sum(F.length("html"))).collect())
    if os.environ.get("PROFILE_STACKS"):
        sampler.stop = True
    timed("scan2", lambda: pages.select(F.sum(F.length("html"))).collect())

    from mix_blink_spark.sources.pages import with_extracted_text, mentions_from_spans

    ext = with_extracted_text(pages).select(
        "url", F.col("extracted_text").alias("text"), "lang"
    )
    timed("extract", lambda: ext.select(F.sum(F.length("text"))).collect())

    m = mentions_from_spans(ext, spans)
    timed("mentions", lambda: m.count())

    timed("surfaces", lambda: (
        m.select("norm").filter(F.length("norm") > 0).distinct().count()
    ))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
