"""Profile the python-direct scan+extract ceiling WITHOUT Spark.

Round-5 question: the mandated local[8]->local[32] pair anti-scales
(9,849 -> 6,761 docs/s in bench_full_r5.json) now that both legs use the
python-direct scan, and the per-stage timings show the scan stage barely
improves from 4 readers (27.8 s) to 16 (23.7 s) while the pure-compute
capacity ladder delivers ~26 effective cores. This tool isolates the scan
kernel from Spark: N forked processes each run the EXACT per-task work of
``read_pages_extracted_python`` (pyarrow read_row_group -> to_pandas ->
utf-8 decode -> extract_text_str) over a disjoint stripe of the real bench
corpus' row groups, page-cache warm, and report wall + user/sys CPU.

Variants swept (the knobs a fix could turn):
  - memory_map on/off   (mmap reads skip kernel read() copies)
  - buffer_size         (pyarrow read buffering)
  - arrow-direct decode (skip to_pandas + bytes() copies; decode straight
                         from the Arrow buffer slices)

Usage: python tools/profile_scan_ceiling.py [corpus_dir] [levels...]
Writes one JSON line to stdout; commit the result under bench_artifacts/.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CORPUS = "/tmp/mbs-bench-corpus-240000-11-80k/corpus"


def list_row_groups(path: str) -> list[tuple[str, int]]:
    import pyarrow.dataset as ds

    frags = []
    for frag in ds.dataset(path, format="parquet").get_fragments():
        for rg in frag.row_groups:
            frags.append((frag.path, rg.id))
    return frags


def warm(path: str) -> None:
    for root, _d, files in os.walk(path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass


def work(stripe: list[tuple[str, int]], variant: str, q: mp.Queue) -> None:
    import pyarrow.parquet as pq

    from mix_blink_spark.functions.text import extract_text_str

    # warm the child (imports, JIT-ish numpy paths) on one row group
    mmap = "mmap" in variant
    t0 = time.monotonic()
    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    n_pages = 0
    total_len = 0
    for path_, rg in stripe:
        pf = pq.ParquetFile(path_, memory_map=mmap, buffer_size=0 if mmap else 1 << 20)
        tbl = pf.read_row_group(int(rg), columns=["url", "lang", "html"])
        if "arrow" in variant:
            # decode straight off the Arrow column; no pandas, no bytes()
            for chunk in tbl.column("html").chunks:
                for v in chunk:
                    s = v.as_buffer().to_pybytes().decode("utf-8", errors="replace")
                    total_len += len(extract_text_str(s))
                    n_pages += 1
        else:
            d = tbl.to_pandas()
            for b in d["html"]:
                s = bytes(b).decode("utf-8", errors="replace")
                total_len += len(extract_text_str(s))
                n_pages += 1
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    q.put(
        {
            "wall": time.monotonic() - t0,
            "user": ru1.ru_utime - ru0.ru_utime,
            "sys": ru1.ru_stime - ru0.ru_stime,
            "pages": n_pages,
            "chk": total_len,
        }
    )


def run_level(frags: list[tuple[str, int]], n: int, variant: str) -> dict:
    stripes = [frags[i::n] for i in range(n)]
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=work, args=(stripes[i], variant, q)) for i in range(n)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    pages = sum(r["pages"] for r in res)
    return {
        "wall": round(wall, 2),
        "pages_per_sec": round(pages / wall, 1),
        "worker_wall_max": round(max(r["wall"] for r in res), 2),
        "worker_wall_min": round(min(r["wall"] for r in res), 2),
        "user_sum": round(sum(r["user"] for r in res), 2),
        "sys_sum": round(sum(r["sys"] for r in res), 2),
        "chk": sum(r["chk"] for r in res),
    }


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CORPUS
    levels = [int(x) for x in sys.argv[2:]] or [4, 8, 16]
    frags = list_row_groups(corpus)
    warm(corpus)
    out: dict = {"corpus": corpus, "n_row_groups": len(frags), "levels": {}}
    variants = ["pandas", "pandas_mmap", "arrow_mmap"]
    for n in levels:
        out["levels"][n] = {}
        for v in variants:
            r = run_level(frags, n, v)
            out["levels"][n][v] = r
            print(f"# n={n} {v}: {r}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
