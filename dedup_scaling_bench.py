#!/usr/bin/env python
"""Secondary N vs 4N scaling evidence: the training-data cleaning
pipeline (MinHash -> LSH banding -> hashed Jaccard verify -> connected
components -> clean_corpus gates) end-to-end on a synthetic document
corpus, at local[4] vs local[16] in separate JVMs — the shuffle-heavy
counterpart to scaling_bench.py's crawl job (whose fixed-bucket layout
is the primary north_rule criterion).

Protocol (BENCH.md; same devices as bench.py, which made the committed
crawl numbers window-independent):

- each worker JVM runs one untimed full-scale pass (C2 JIT compiles on
  real invocation counts — a tiny warm-up leaves the timed pass up to
  4x slower) then times HOT_REPS passes, keeping the best;
- legs interleave (N, 4N, N, 4N, ...) and each leg is gated on the
  pre-leg CPU probe (defer while the host VM is in a degraded window)
  and NORMALIZED by the mean of its pre/post probe efficiency — the
  box's effective capacity swings 30-45% between minutes, far past
  what best-of-legs can average out (an ungated run recorded 16-core
  legs at 86 s and 123 s in adjacent windows);
- the summary reports raw AND normalized throughputs, per-leg probes,
  and per-adjacent-pair raw ratios as the window-noise witness;
- corpus sized compute-bound (600k x 120-token docs): at 150k x 80 the
  whole job is ~12 MB of text and driver/stage fixed costs dominate
  (measured efficiency 0.24 cold / 0.58 hot) — the wrong regime to
  extrapolate to 100 TB from;
- FIXED shuffle-partition count at BOTH sizes: partitions == cores
  gates every stage on its straggler wave (crawl bench bucket sweep:
  3.4x at 16 cores vs 3.9x fixed-64) and physical layout must not
  change with cluster size anyway.

Usage: python dedup_scaling_bench.py (PATHIK_DEDUP_DOCS /
PATHIK_DEDUP_TOKENS / PATHIK_DEDUP_REPS to resize).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("PATHIK_DEDUP_DOCS", "600000"))
N_CORES = int(os.environ.get("PATHIK_SCALE_N", "4"))
N4_CORES = 4 * N_CORES
REPS = int(os.environ.get("PATHIK_DEDUP_REPS", "3"))
HOT_REPS = int(os.environ.get("PATHIK_DEDUP_HOT_REPS", "1"))
DOC_TOKENS = int(os.environ.get("PATHIK_DEDUP_TOKENS", "120"))
SHUFFLE_PARTITIONS = int(os.environ.get("PATHIK_DEDUP_SHUFFLE", "64"))
CORPUS = f"/tmp/pathik_dedup_corpus/d{N_DOCS}t{DOC_TOKENS}_seed42"
os.environ.setdefault("PATHIK_DRIVER_MEM", "24g")

VOCAB_SIZE = 512
DUP_EVERY = 10  # doc_id % DUP_EVERY == 1 -> near-dup of doc_id - 1


def gen_corpus() -> None:
    """Expression-only distributed generation: token i of document d is
    vocab[xxhash64(base_id, i) % V] where base_id collapses each
    near-dup onto its source doc; dups append one extra token so the
    pair is near- (not exactly-) identical. Deterministic, no RNG
    state, generated at full cluster width."""
    from pyspark.sql import functions as F

    from pathik_spark.session import get_spark

    spark = get_spark("dedup_corpus_gen", master="local[32]", shuffle_partitions=32)
    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(VOCAB_SIZE)])
    df = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    is_dup = F.pmod(F.col("doc_id"), F.lit(DUP_EVERY)) == 1
    base_id = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(base_id, i), F.lit(VOCAB_SIZE)) + 1).cast("int")
            ),
        ),
    )
    text = F.when(is_dup, F.concat(body, F.lit(" extra"))).otherwise(body)
    (
        df.select("doc_id", text.alias("text"))
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{CORPUS}/documents.parquet")
    )
    spark.stop()


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from pathik_spark.operators import dedup as D
    from pathik_spark.operators.quality import clean_corpus
    from pathik_spark.session import get_spark

    spark = get_spark(
        f"dedup_scale_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )
    docs = spark.read.parquet(f"{CORPUS}/documents.parquet")
    docs.count()  # warm footers/page cache out of the timing

    def one_pass() -> None:
        # distinct=False: minhash's min-agg and jaccard's collect_set both
        # dedup in-agg — the standalone distinct shuffle is pure waste
        sh = D.word_shingles(docs, n=3, distinct=False)
        sig = D.minhash_signatures(sh, num_hashes=16)  # production xxhash64 family
        cands = D.lsh_candidate_pairs(
            sig, num_hashes=16, band_size=2, compact32=True
        )
        pairs = D.jaccard_pairs(sh, cands, threshold=0.4, hashed=True)
        out = clean_corpus(docs, pairs)
        out.write.format("noop").mode("overwrite").save()

    # Untimed full-scale warm pass: C2-compiles every generated operator
    # at real invocation counts (a 500-doc warm-up leaves the timed pass
    # interpreter-bound and measures JIT, not the engine).
    t0 = time.perf_counter()
    one_pass()
    warm_dt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(HOT_REPS):
        t0 = time.perf_counter()
        one_pass()
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "sec": best,
                "warm_sec": round(warm_dt, 2),
                "docs_per_sec": N_DOCS / best,
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    # probe gate + normalization devices shared with bench.py
    from bench import PROBE_REF_EFF, gated_probe

    if not os.path.exists(f"{CORPUS}/documents.parquet/_SUCCESS"):
        gen_corpus()
    legs: list[dict] = []
    for rep in range(REPS):
        for cpus in (N_CORES, N4_CORES):  # interleaved across the window
            pre = gated_probe()  # defers while the window is degraded
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            post_eff = __import__("bench")._hw_noise_probe()[
                "hw_probe_parallel_efficiency"
            ]
            r = json.loads(line)
            eff = (pre["hw_probe_parallel_efficiency"] + post_eff) / 2
            factor = min(1.0, eff / PROBE_REF_EFF)
            leg = {
                "rep": rep,
                "cpus": cpus,
                "sec_raw": round(r["sec"], 1),
                "warm_sec": r["warm_sec"],
                "probe_eff_pre": pre["hw_probe_parallel_efficiency"],
                "probe_eff_post": post_eff,
                "sec_norm": round(r["sec"] * factor, 1),
            }
            legs.append(leg)
            print(json.dumps(leg), flush=True)
    best_raw = {c: min(l["sec_raw"] for l in legs if l["cpus"] == c) for c in (N_CORES, N4_CORES)}
    best_norm = {c: min(l["sec_norm"] for l in legs if l["cpus"] == c) for c in (N_CORES, N4_CORES)}
    pair_ratios = [
        round(legs[i]["sec_raw"] / legs[i + 1]["sec_raw"], 3)
        for i in range(0, len(legs) - 1, 2)
    ]
    summary = {
        "n_docs": N_DOCS,
        "docs_per_sec_localN": round(N_DOCS / best_raw[N_CORES], 1),
        "docs_per_sec_local4N": round(N_DOCS / best_raw[N4_CORES], 1),
        "speedup_N_to_4N": round(best_raw[N_CORES] / best_raw[N4_CORES], 3),
        "scaling_efficiency": round(best_raw[N_CORES] / best_raw[N4_CORES] / 4, 3),
        "speedup_N_to_4N_norm": round(best_norm[N_CORES] / best_norm[N4_CORES], 3),
        "scaling_efficiency_norm": round(
            best_norm[N_CORES] / best_norm[N4_CORES] / 4, 3
        ),
        "adjacent_pair_raw_ratios": pair_ratios,
        "legs": legs,
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_dedup_scaling.json"), "w") as f:
        json.dump(summary, f)


if __name__ == "__main__":
    main()
