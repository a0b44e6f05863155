#!/usr/bin/env python
"""Hardware scaling ceiling for the N vs 4N protocol (BENCH.md).

Runs the engine's actual extraction kernel (kernels.extract.extract_both,
the dominant compute of a crawl round) over real bench-corpus pages in K
fully independent Python processes — no Spark, no IPC inside the timed
section. The 4->16-process speedup this prints is the most this box can
physically deliver for the workload (frequency + memory-bandwidth clamp);
a real 4N-executor cluster has 4x of everything and does not share it.

Usage: python hw_ceiling.py [corpus_pages_dir]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_PAGES = 400
CORPUS = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/tmp/pathik_bench_corpus/p200000_s40000_x12_seed42/pages.parquet"
)


def _worker(n_iters: int):
    import duckdb

    from pathik_spark.kernels.extract import extract_both

    rows = duckdb.sql(
        f"SELECT html FROM '{CORPUS}/*.parquet' LIMIT {N_PAGES}"
    ).fetchall()
    pages = [r[0] for r in rows]
    for h in pages[:50]:  # warm
        extract_both(h)
    t0 = time.perf_counter()
    done = 0
    for _ in range(n_iters):
        for h in pages:
            extract_both(h)
            done += 1
    return done, time.perf_counter() - t0


def main() -> None:
    rates = {}
    for procs in (4, 16):
        with mp.Pool(procs) as p:
            res = p.map(_worker, [2] * procs)
        # rate over the slowest worker's pure-compute window (loads excluded)
        rates[procs] = sum(r[0] for r in res) / max(r[1] for r in res)
        print(json.dumps({"procs": procs, "pages_per_sec": round(rates[procs], 1)}))
    print(
        json.dumps(
            {
                "speedup_4_to_16": round(rates[16] / rates[4], 3),
                "hw_ceiling_efficiency": round(rates[16] / rates[4] / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
