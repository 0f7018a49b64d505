"""AQE skew-join demonstration at bench scale (TODO item, round 3).

Builds a pathologically skewed block join — one hot key carrying ~30% of a
synthetic keyed-records table, dim-style right side — and times the join with
``spark.sql.adaptive.skewJoin.enabled`` on vs off (fresh subprocess/JVM per
leg, interleaved reps, medians), recording whether the executed plan shows
the skew split. This is the knob the 100 TB deployment leans on when a
viral surface form floods one blocking key; the engine's own guards
(block-size cap + sorted-neighborhood, operators/blocking.py) bound the
PAIR COUNT, while AQE bounds the per-task shuffle read — this experiment
isolates the latter by joining payloads on the raw key.

Usage: python tools/profile_skewjoin.py [--rows 2000000] [--reps 2]
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leg(rows: int, skew_on: bool) -> None:
    from pyspark.sql import functions as F

    from mix_blink_spark.session import get_spark

    spark = get_spark(
        app_name=f"skew-{skew_on}",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.adaptive.skewJoin.enabled": str(skew_on).lower(),
            # make the demonstration sensitive: default thresholds would
            # not flag these partition sizes on a small corpus
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # force the shuffle path: the demo is about skewed SHUFFLE
            # partitions, and the session default would broadcast the
            # dimension-sized right side (no shuffle, nothing to split)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    # ~30% of rows share one hot key; the rest spread over 10k keys, so
    # without the split ONE reducer sorts/joins 30% of the shuffle bytes
    # while 31 idle — the straggler a viral surface form creates. The
    # right side is one dim row per key (no pair explosion; output ==
    # left size, identical across legs).
    base = spark.range(rows).select(
        F.when(F.col("id") % 10 < 3, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 10000).cast("string")))
        .alias("key"),
        F.col("id").cast("string").alias("rid"),
        F.sha2(F.col("id").cast("string"), 256).alias("norm"),
    )
    right = spark.range(10001).select(
        F.when(F.col("id") == 10000, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("key"),
        F.lit("dim").alias("d"),
    )
    # aggregate wrapper so the SAME QueryExecution can be collected (a
    # bare count() plans a separate one and the skew marker is invisible)
    result = base.join(right, "key").agg(
        F.count("*").alias("n"), F.bit_xor(F.xxhash64("rid", "d")).alias("h")
    )
    t0 = time.monotonic()
    row = result.collect()[0]
    sec = time.monotonic() - t0
    plan = result._jdf.queryExecution().executedPlan().toString()
    print(
        json.dumps(
            {
                "leg_sec": round(sec, 2),
                "rows_out": row["n"],
                "hash": row["h"],
                "skew_split_in_plan": "SortMergeJoin(skew=true)" in plan
                or "AQEShuffleRead skewed" in plan,
            }
        )
    )
    spark.stop()


def run_leg(rows: int, skew_on: bool) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", str(rows), str(int(skew_on))],
        capture_output=True,
        text=True,
        env=os.environ.copy(),
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if "leg_sec" in d:
                return d
        except json.JSONDecodeError:
            continue
    raise RuntimeError("skew leg failed: " + proc.stderr[-1500:])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), bool(int(sys.argv[3])))
        return
    rows, reps = 2_000_000, 2
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--rows":
            rows = int(args[i + 1]); i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            i += 1
    runs: dict[bool, list[dict]] = {True: [], False: []}
    for _ in range(reps):
        for on in (True, False):
            runs[on].append(run_leg(rows, on))
    out = {
        "rows": rows,
        "reps": reps,
        "skew_on_sec": round(statistics.median(r["leg_sec"] for r in runs[True]), 2),
        "skew_off_sec": round(statistics.median(r["leg_sec"] for r in runs[False]), 2),
        "rows_out": runs[True][0]["rows_out"],
        "rows_out_match": runs[True][0]["rows_out"] == runs[False][0]["rows_out"],
        "skew_split_in_plan_on": runs[True][0]["skew_split_in_plan"],
        "skew_split_in_plan_off": runs[False][0]["skew_split_in_plan"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
