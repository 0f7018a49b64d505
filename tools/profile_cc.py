"""Attribute cc_star_10m's round-over-round variance (94-249 s at 6
iterations flat) to a specific join round vs uniform host-window slowness
(round-6 verdict item 3).

Protocol: TWO back-to-back runs of the identical 4M-node/10M-edge star
loop in ONE session, each recording per-iteration wall seconds AND the
post-iteration edge count (operators/cc.py stats), bracketed by membw
probes as the window tell. Interpretation key, pre-registered:

  - If sec/Medge is roughly FLAT across iterations within a run, the
    expensive iterations are expensive because they carry more edges
    (volume, a plan property) — and a slow round is a slow window, not
    skew: fix nothing.
  - If one iteration's sec/Medge is an outlier in BOTH runs, that round
    has a structural problem (e.g. a giant-star groupBy key) — fix THAT
    join round.

Usage: python tools/profile_cc.py [--edges 10000000] [--nodes 4000000] [--reps 2]
Output: bench_artifacts/cc_attrib_r7.json + one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--nodes", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench
    from mix_blink_spark.session import get_spark

    membw_before = bench.membw_ladder(levels=(4,))
    spark = get_spark(
        app_name="cc-attrib",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )
    runs = []
    for rep in range(args.reps):
        st: dict = {}
        t0 = time.monotonic()
        sec = bench.cc_star_benchmark(
            spark, n_nodes=args.nodes, n_edges=args.edges, stats=st
        )
        runs.append(
            {
                "rep": rep,
                "total_sec": round(sec, 2),
                "iterations": st.get("iterations"),
                "iter_secs": st.get("iter_secs"),
                "iter_edges": st.get("iter_edges"),
                "sec_per_medge": [
                    round(s / (e / 1e6), 3) if e else None
                    for s, e in zip(st.get("iter_secs") or [], st.get("iter_edges") or [])
                ],
                "wall_sec": round(time.monotonic() - t0, 2),
            }
        )
        print(json.dumps(runs[-1]), flush=True)
    spark.stop()
    membw_after = bench.membw_ladder(levels=(4,))

    out = {
        "edges": args.edges,
        "nodes": args.nodes,
        "cpus": args.cpus,
        "membw_gbps_4_before": membw_before.get("membw_gbps_4"),
        "membw_gbps_4_after": membw_after.get("membw_gbps_4"),
        "runs": runs,
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts",
        "cc_attrib_r7.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": dest, **{k: out[k] for k in ("membw_gbps_4_before", "membw_gbps_4_after")}}))


if __name__ == "__main__":
    main()
