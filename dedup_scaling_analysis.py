#!/usr/bin/env python
"""Event-log decomposition of the dedup-pipeline N vs 4N runs: separates
ENGINE parallel efficiency (task concurrency the plan actually achieves)
from the BOX's per-core throughput under load (CPU-seconds inflation for
identical work) — the quantity a real 4N-executor cluster does not
share, because each node has its own sockets/memory controllers.

Runs the same pipeline as dedup_scaling_bench.py (warm pass + one timed
pass) at local[N] and local[4N] with the Spark event log on, then reads
per-task metrics for the timed pass and prints, per size:

- wall s, total task run s, total task CPU s;
- avg task concurrency = run/wall (and /cores = engine parallel eff);
- GC s, spilled bytes, shuffle bytes (work-identity witness);

and the decomposition: speedup = concurrency_ratio x percore_ratio.

Usage: python dedup_scaling_analysis.py  (PATHIK_SCALE_N to resize)
"""

from __future__ import annotations

import collections
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_CORES = int(os.environ.get("PATHIK_SCALE_N", "4"))
N_DOCS = int(os.environ.get("PATHIK_DEDUP_DOCS", "600000"))
DOC_TOKENS = int(os.environ.get("PATHIK_DEDUP_TOKENS", "120"))
CORPUS = f"/tmp/pathik_dedup_corpus/d{N_DOCS}t{DOC_TOKENS}_seed42"
EVDIR = "/tmp/pathik_dedup_eventlog"
os.environ.setdefault("PATHIK_DRIVER_MEM", "24g")


def _one_size(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )


def worker(cpus: int) -> None:
    from pathik_spark.operators import dedup as D
    from pathik_spark.operators.quality import clean_corpus
    from pathik_spark.session import get_spark

    os.makedirs(EVDIR, exist_ok=True)
    for old in glob.glob(f"{EVDIR}/*"):
        subprocess.run(["rm", "-rf", old], check=True)
    spark = get_spark(
        f"dedup_analysis_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    docs = spark.read.parquet(f"{CORPUS}/documents.parquet")
    docs.count()

    def one_pass() -> None:
        sh = D.word_shingles(docs, n=3, distinct=False)
        sig = D.minhash_signatures(sh, num_hashes=16)
        cands = D.lsh_candidate_pairs(sig, num_hashes=16, band_size=2)
        pairs = D.jaccard_pairs(sh, cands, threshold=0.4, hashed=True)
        clean_corpus(docs, pairs).write.format("noop").mode("overwrite").save()

    one_pass()  # untimed warm pass (C2 JIT at real invocation counts)
    t0 = time.perf_counter()
    one_pass()
    wall = time.perf_counter() - t0
    spark.stop()
    tot = _timed_pass_totals()
    tot.update({"cpus": cpus, "wall_s": round(wall, 1)})
    print(json.dumps(tot))


def _timed_pass_totals() -> dict:
    evdir = sorted(glob.glob(f"{EVDIR}/*"))[-1]
    (path,) = glob.glob(f"{evdir}/events_*.zstd")
    lines = subprocess.run(
        ["zstd", "-dc", path], capture_output=True, text=True, check=True
    ).stdout.splitlines()
    per_stage: dict[int, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    stage_ids = []
    for line in lines:
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if e.get("Event") == "SparkListenerStageCompleted":
            stage_ids.append(e["Stage Info"]["Stage ID"])
        elif e.get("Event") == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            s = per_stage[e["Stage ID"]]
            s["run_s"] += m.get("Executor Run Time", 0) / 1000
            s["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
            s["gc_s"] += m.get("JVM GC Time", 0) / 1000
            s["shuffle_mb"] += (
                (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                / 1e6
            )
            s["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
    # the timed pass is the second identical half of the stage sequence
    cut = sorted(stage_ids)[len(stage_ids) // 2]
    tot: collections.Counter = collections.Counter()
    for sid, s in per_stage.items():
        if sid >= cut:
            tot.update(s)
    return {k: round(v, 1) for k, v in tot.items()}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    if not os.path.exists(f"{CORPUS}/documents.parquet/_SUCCESS"):
        from dedup_scaling_bench import gen_corpus

        gen_corpus()
    res = {c: _one_size(c) for c in (N_CORES, 4 * N_CORES)}
    for c, r in res.items():
        r["avg_concurrency"] = round(r["run_s"] / r["wall_s"], 2)
        r["engine_parallel_eff"] = round(r["avg_concurrency"] / c, 3)
        print(json.dumps(r))
    a, b = res[N_CORES], res[4 * N_CORES]
    decomp = {
        "wall_speedup": round(a["wall_s"] / b["wall_s"], 3),
        "concurrency_ratio": round(
            b["avg_concurrency"] / a["avg_concurrency"], 3
        ),
        "percore_throughput_ratio": round(a["cpu_s"] / b["cpu_s"], 3),
        "work_identity_shuffle_mb": [a["shuffle_mb"], b["shuffle_mb"]],
    }
    print(json.dumps(decomp))
    with open(os.path.join(REPO, "BENCH_dedup_analysis.json"), "w") as f:
        json.dump({"sizes": res, "decomposition": decomp}, f)


if __name__ == "__main__":
    main()
