"""Bisect the high-concurrency sys-time blowup: which component of the
pipeline drives the kernel share at 32-way parallelism?

One local[32] session runs four cases, interleaved over reps, each with
(a) a /proc/stat-windowed box-wide sys/user split and (b) a sampled
histogram of the JVM's in-kernel syscalls (/proc/<tid>/syscall — the
profiler this box has when perf/strace are absent):

  jvm_compute — spark.range + xxhash/aggregate: no IO, no Python
  scan        — parquet scan + sum(length(html)): page-cache reads, no Python
  extract     — scan + Python pandas-UDF extraction: + Arrow socket traffic
  shuffle     — repartition(64) on the html column: + shuffle write/read

Usage: python tools/profile_sysbisect.py [--pages 60000] [--reps 2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SYSCALL_NAMES = {
    0: "read", 1: "write", 7: "poll", 9: "mmap", 11: "munmap", 17: "pread64",
    23: "select", 28: "madvise", 35: "nanosleep", 39: "getpid", 44: "sendto",
    45: "recvfrom", 61: "wait4", 98: "getrusage", 202: "futex", 228: "clock_gettime",
    230: "clock_nanosleep", 232: "epoll_wait", 257: "openat", 271: "ppoll",
    281: "epoll_pwait", 334: "rseq",
}


def cpu_jiffies() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()
    return int(parts[1]) + int(parts[2]), int(parts[3])


class SyscallSampler(threading.Thread):
    """Samples every thread of this process tree's JVM + python workers:
    which syscall is each *in-kernel* thread executing right now?"""

    def __init__(self, pids: list[int]):
        super().__init__(daemon=True)
        self.pids = pids
        self.counts: Counter = Counter()
        self.stop_flag = False

    def run(self) -> None:
        while not self.stop_flag:
            for pid in self.pids:
                try:
                    tids = os.listdir(f"/proc/{pid}/task")
                except OSError:
                    continue
                for tid in tids:
                    try:
                        line = open(f"/proc/{pid}/task/{tid}/syscall").read().split()
                    except OSError:
                        continue
                    if not line or line[0] == "running":
                        self.counts["userspace"] += 1
                        continue
                    try:
                        num = int(line[0])
                    except ValueError:
                        continue
                    if num >= 0:
                        self.counts[SYSCALL_NAMES.get(num, f"sys_{num}")] += 1
            time.sleep(0.05)


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from mix_blink_spark.session import get_spark
    from mix_blink_spark.sources.pages import with_extracted_text

    pages_n, reps = 60000, 2
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--pages":
            pages_n = int(args[i + 1]); i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            i += 1

    spark = get_spark(app_name="sysbisect", master="local[32]", shuffle_partitions=64)
    bench._prepare_corpus(spark, pages_n)
    path = bench._corpus_path(pages_n)
    bench._warm_page_cache(path)
    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    pages = corpus.select("url", "warc_ts", "html", "lang").coalesce(32)

    jvm_pid = os.getpid()  # local mode: driver process IS the executor JVM's parent
    import subprocess

    jps = subprocess.run(["jps"], capture_output=True, text=True).stdout
    jpids = [int(l.split()[0]) for l in jps.splitlines() if "SparkSubmit" in l]

    cases = {
        "jvm_compute": lambda: spark.range(0, 2_000_000_000, 1, 32)
        .select(F.bit_xor(F.xxhash64("id"))).collect(),
        "scan": lambda: pages.select(F.sum(F.length("html"))).collect(),
        "extract": lambda: with_extracted_text(pages)
        .select(F.sum(F.length("extracted_text"))).collect(),
        "shuffle": lambda: pages.repartition(64, "url")
        .select(F.sum(F.length("html"))).collect(),
    }

    # warm-up each case once
    for fn in cases.values():
        fn()

    out: dict = {"pages": pages_n, "reps": reps, "cases": {}}
    acc: dict[str, dict] = {k: {"sec": [], "sys": [], "calls": Counter()} for k in cases}
    for _ in range(reps):
        for name, fn in cases.items():
            sampler = SyscallSampler(jpids or [jvm_pid])
            u0, s0 = cpu_jiffies()
            t0 = time.monotonic()
            sampler.start()
            fn()
            sampler.stop_flag = True
            dt = time.monotonic() - t0
            u1, s1 = cpu_jiffies()
            sampler.join(timeout=1)
            acc[name]["sec"].append(dt)
            acc[name]["sys"].append((s1 - s0) / max(u1 - u0 + s1 - s0, 1))
            acc[name]["calls"].update(sampler.counts)

    for name, a in acc.items():
        calls = a["calls"]
        busy = sum(v for k, v in calls.items() if k not in ("futex", "epoll_wait", "poll", "ppoll", "epoll_pwait", "nanosleep", "clock_nanosleep", "wait4"))
        out["cases"][name] = {
            "sec": round(statistics.median(a["sec"]), 2),
            "sec_all": [round(x, 1) for x in a["sec"]],
            "sys_share_pct": round(100 * statistics.median(a["sys"]), 1),
            "top_syscalls": dict(calls.most_common(8)),
            "nonidle_samples": busy,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
