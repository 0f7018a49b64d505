"""Round-8 optimization harness (bench.py is FROZEN for measurement — this
file carries the extra instrumentation the optimization round needs).

Times each declared bench query with the same methodology as bench.py's
query loop (same session shape, same .count() action, median over
interleaved rounds) at any SF dir, and can dump .explain("formatted")
plans per query for the plans/r08 evidence files.

Usage:
  python bench_extra.py                       # time all queries at $SPARK_GRAFT_SF_DIR
  python bench_extra.py --queries a,b,c       # subset
  python bench_extra.py --explain DIR         # also write DIR/<q>.txt plans
  python bench_extra.py --reps 3              # rounds (default 3)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, _session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    spark = _session(args.cpus)
    qs["s1_scan_filter"](spark, args.sf_dir).count()  # warm-up, like bench.py

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(f"plans written to {args.explain}", file=sys.stderr)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            qs[name](spark, args.sf_dir).count()
            samples[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    med = {n: round(statistics.median(v), 3) for n, v in samples.items() if v}
    out = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "reps": args.reps,
        "queries": med,
        "value": round(sum(med.values()), 3),
        "samples": {n: [round(x, 3) for x in v] for n, v in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
