#!/usr/bin/env python
"""Window-independent witness for the compact32 banding change: run
one dedup-pipeline pass per arm in its own JVM with the Spark UI
enabled and sum shuffle read/write bytes over all stages from the
REST API. Bytes are deterministic per plan, so this comparison is
valid in ANY measurement window (unlike wall time — see BENCH.md).

Usage: python dedup_bytes_check.py            (both arms, one JVM each)
       python dedup_bytes_check.py --worker <arm>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("PATHIK_DEDUP_DOCS", "600000"))
DOC_TOKENS = int(os.environ.get("PATHIK_DEDUP_TOKENS", "120"))
SHUFFLE_PARTITIONS = int(os.environ.get("PATHIK_DEDUP_SHUFFLE", "64"))
CORPUS = f"/tmp/pathik_dedup_corpus/d{N_DOCS}t{DOC_TOKENS}_seed42"
os.environ.setdefault("PATHIK_DRIVER_MEM", "24g")


def worker(arm: str) -> None:
    import urllib.request

    from pathik_spark.operators import dedup as D
    from pathik_spark.operators.quality import clean_corpus
    from pathik_spark.session import get_spark

    spark = get_spark(
        f"dedup_bytes_{arm}",
        master="local[16]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = spark.read.parquet(f"{CORPUS}/documents.parquet")
    docs.count()
    sh = D.word_shingles(docs, n=3, distinct=False)
    sig = D.minhash_signatures(sh, num_hashes=16)
    cands = D.lsh_candidate_pairs(
        sig, num_hashes=16, band_size=2, compact32=(arm == "compact32")
    )
    pairs = D.jaccard_pairs(sh, cands, threshold=0.4, hashed=True)
    clean_corpus(docs, pairs).write.format("noop").mode("overwrite").save()

    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl  # actual bound host:port (retries shift it)
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    stages = json.loads(urllib.request.urlopen(url).read())
    done = [s for s in stages if s["status"] == "COMPLETE"]
    out = {
        "arm": arm,
        "stages": len(done),
        "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in done),
        "shuffle_read_bytes": sum(s["shuffleReadBytes"] for s in done),
        "output_bytes": sum(s["outputBytes"] for s in done),
    }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return
    if not os.path.isdir(CORPUS):
        import dedup_scaling_bench as dsb

        dsb.gen_corpus()
    for arm in ("struct64", "compact32"):
        subprocess.check_call([sys.executable, __file__, "--worker", arm])


if __name__ == "__main__":
    main()
