"""Deliverable-CPU ladder: how many cores' worth of work does this box
actually execute at N concurrent processes?

No Spark, no IO: N forked workers each run the real extraction kernel on
in-memory pages for a FIXED duration and count completions. Aggregate
pages/sec at level N divided by the level-1 rate = the box's effective
parallel capacity at N — immune to straggler effects (work-counting, not
barrier-timed) and to page-cache state. Levels are interleaved over
``reps`` rounds; medians reported.

On a healthy 32-core box this is ~linear to 32. On an oversubscribed
shared-host microVM it plateaus at the host cycles actually provisioned —
which is the scaling ceiling NO process topology (threads, JVMs,
executors) can exceed.

Usage: python tools/profile_capacity.py [--secs 8] [--reps 3] [n ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PAGES: list[str] = []


def _work(q, secs: float) -> None:
    from mix_blink_spark.functions.text import extract_text_str

    for p in _PAGES[:50]:  # warm in the child
        extract_text_str(p)
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs:
        extract_text_str(_PAGES[n % len(_PAGES)])
        n += 1
    q.put(n)


def main() -> None:
    import random

    from mix_blink_spark.fixtures import _gen_page, make_entities

    secs, reps = 8.0, 3
    levels: list[int] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--secs":
            secs = float(args[i + 1]); i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            levels.append(int(args[i])); i += 1
    if not levels:
        levels = [1, 2, 4, 8, 16, 32]

    rng = random.Random(1)
    ents = make_entities(rng, 50)
    global _PAGES
    _PAGES = [_gen_page(i, 11, ents, ["x"], 80)["html"].decode() for i in range(100)]

    rates: dict[int, list[float]] = {n: [] for n in levels}
    for _ in range(reps):
        for n in levels:
            q: mp.Queue = mp.Queue()
            ps = [mp.Process(target=_work, args=(q, secs)) for _ in range(n)]
            for p in ps:
                p.start()
            total = sum(q.get() for _ in ps)
            for p in ps:
                p.join()
            rates[n].append(total / secs)

    med = {n: statistics.median(v) for n, v in rates.items()}
    base = med[levels[0]] / levels[0]
    print(
        json.dumps(
            {
                "secs": secs,
                "reps": reps,
                "pages_per_sec": {str(n): round(r, 1) for n, r in med.items()},
                "effective_cores": {str(n): round(med[n] / base, 2) for n in levels},
                "all": {str(n): [round(x, 1) for x in v] for n, v in rates.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
