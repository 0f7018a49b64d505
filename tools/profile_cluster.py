"""Single-JVM local[N] vs multi-JVM local-cluster[N/4, 4] A/B on the full
ER pipeline — the experiment that separates "the plan doesn't scale" from
"one shared JVM address space doesn't scale on this box".

Motivation (round-3 profiling): at local[32] the box sits at 40-55%
SYSTEM time with executor task threads only ~35% busy — kernel-side
contention in the single shared process. A real cluster (the north rule's
spark-submit target) runs each executor in its own JVM; Spark's
local-cluster master reproduces exactly that on one machine (separate
executor JVMs, real RPC + shuffle), so:

  local-cluster[2,4,*]  == 2 executors x 4 cores  (N  = 8 cores)
  local-cluster[8,4,*]  == 8 executors x 4 cores  (4N = 32 cores)

is the faithful single-box rendering of "N and 4N executors".

Usage: python tools/profile_cluster.py [--pages 60000] [--reps 2]
Output: one JSON line per leg + a summary line with efficiencies.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXEC_CORES = 4
EXEC_MEM_MB = 9216


def _package_zip() -> str:
    """Zip mix_blink_spark for --py-files-style shipping to executors."""
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = "/tmp/mbs-pyfiles.zip"
    with zipfile.ZipFile(out, "w") as zf:
        pkg = os.path.join(repo, "mix_blink_spark")
        for root, _dirs, files in os.walk(pkg):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.relpath(full, repo))
    return out


def _master(mode: str, cores: int) -> str:
    if mode == "local":
        return f"local[{cores}]"
    n_exec = cores // EXEC_CORES
    return f"local-cluster[{n_exec},{EXEC_CORES},{EXEC_MEM_MB}]"


def _leg(mode: str, cores: int, pages: int) -> None:
    import bench
    from mix_blink_spark.session import get_spark

    extra = {
        "spark.speculation": "true",
        "spark.speculation.multiplier": "1.5",
        "spark.speculation.quantile": "0.75",
        "spark.sql.files.maxPartitionBytes": str(24 * 1024 * 1024),
    }
    if mode == "cluster":
        # driver does no heavy lifting in cluster mode; executors carry
        # their own heaps via the master string
        extra["spark.driver.memory"] = "8g"
        # local-cluster's third arg is the WORKER's budget; the executor
        # JVM itself defaults to -Xmx1g and dies under 4-core Arrow load
        extra["spark.executor.memory"] = "8g"
        extra["spark.python.worker.reuse"] = "true"
        # executors are separate JVMs spawning their own Python workers:
        # ship the package the way the north rule launches it —
        # spark-submit --py-files equivalent
        extra["spark.submit.pyFiles"] = _package_zip()
    spark = get_spark(
        app_name=f"ab-{mode}-{cores}",
        master=_master(mode, cores),
        shuffle_partitions=max(cores * 2, 8),
        extra_conf=extra,
    )
    bench._prepare_corpus(spark, bench.WARM_PAGES)
    bench._run_er(spark, bench.WARM_PAGES)
    bench._prepare_corpus(spark, pages)
    bench._warm_page_cache(bench._corpus_path(pages))
    sec, _ = bench._run_er(spark, pages)
    print(json.dumps({"leg_sec": round(sec, 2)}))
    spark.stop()


def run_leg(mode: str, cores: int, pages: int) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", mode, str(cores), str(pages)],
        capture_output=True,
        text=True,
        env=os.environ.copy(),
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if "leg_sec" in d:
                return float(d["leg_sec"])
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"leg {mode}/{cores} failed; stderr tail: " + proc.stderr[-2000:])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    pages, reps = 60000, 2
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--pages":
            pages = int(args[i + 1]); i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            i += 1

    legs = [("local", 8), ("cluster", 8), ("local", 32), ("cluster", 32)]
    runs: dict[tuple[str, int], list[float]] = {leg: [] for leg in legs}
    for _ in range(reps):
        for leg in legs:
            t = run_leg(*leg, pages)
            runs[leg].append(t)
            print(json.dumps({"mode": leg[0], "cores": leg[1], "sec": t}), flush=True)

    med = {leg: statistics.median(v) for leg, v in runs.items()}
    out = {
        "pages": pages,
        "reps": reps,
        **{f"{m}_{c}_sec": round(s, 2) for (m, c), s in med.items()},
        "eff_local_8_32": round(med[("local", 8)] / med[("local", 32)] / 4, 3),
        "eff_cluster_8_32": round(med[("cluster", 8)] / med[("cluster", 32)] / 4, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
