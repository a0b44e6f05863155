#!/usr/bin/env python
"""Hardware scaling ceilings for the N vs 4N protocol (BENCH.md).

Two probes, no Spark, no IPC inside any timed section; each runs in K
fully independent Python processes at K=4 and K=16. The speedups they
print are the most this box can physically deliver for the respective
resource — a real 4N-executor cluster has 4x of everything and does
not share it:

- compute ceiling: the engine's actual extraction kernel
  (kernels.extract.extract_both, the dominant compute of a crawl
  round) over real bench-corpus pages — binds on core count/frequency;
  the ceiling to quote for the CPU-bound crawl job.
- bandwidth ceiling: a STREAM-triad loop (a = b*s + c over LLC-busting
  float64 arrays) — binds on the shared memory controllers; the
  ceiling to quote for shuffle/allocation-heavy jobs (the dedup
  cleaning pipeline), whose per-core arithmetic is trivial but whose
  bytes/s demand is not.

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


def _bw_worker(n_iters: int):
    import numpy as np

    n = 32 * 1024 * 1024  # 3 arrays x 256 MB: far past any LLC
    b = np.ones(n)
    c = np.ones(n)
    a = b * 1.0001 + c  # touch + warm
    t0 = time.perf_counter()
    for _ in range(n_iters):
        np.multiply(b, 1.0001, out=a)
        a += c
    dt = time.perf_counter() - t0
    # triad moves ~4 arrays per iteration (read b, write a, read a+c, write a)
    return n_iters * 4 * n * 8, dt


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
    bw = {}
    for procs in (4, 16):
        with mp.Pool(procs) as p:
            res = p.map(_bw_worker, [4] * procs)
        bw[procs] = sum(r[0] for r in res) / max(r[1] for r in res) / 1e9
        print(json.dumps({"procs": procs, "mem_gb_per_sec": round(bw[procs], 1)}))
    print(
        json.dumps(
            {
                "bw_speedup_4_to_16": round(bw[16] / bw[4], 3),
                "bw_ceiling_efficiency": round(bw[16] / bw[4] / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
