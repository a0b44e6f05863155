"""Partitioned cuckoo-filter URL-seen pre-filter (B2, the north-star's
"bloom/cuckoo" second arm).

Same contract and composition as the bloom shards in operators/seen.py
— the filter only ROUTES frontier rows (miss = definitely new, passes
straight through; hit = maybe seen, verified by the exact anti-join),
so a false positive can never drop a row and the composed result is
exactly the plain anti-join. What the cuckoo filter adds over bloom
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014) is DELETION: when the recrawl TTL expires a URL, its fingerprint
can be removed from the in-memory filter between rounds instead of
rebuilding the whole shard set — the exact freshness cutoff stays with
the anti-join (recrawl_filter), deletion just keeps the pre-filter's
hit rate from decaying as the crawl ages.

Layout per shard: ``m`` buckets (power of two) x 4 slots of uint16
fingerprints (0 = empty). fp = top 16 bits of the already-computed
xxhash64 url_hash (never 0); bucket1 = h mod m; bucket2 = bucket1 XOR
(fp * odd-constant) mod m — involutive because m is a power of two, so
probe/delete never need to know which bucket an item landed in.
Eviction is a bounded kick walk with a deterministic victim slot
(kick counter mod 4): same input set -> bit-identical table on every
executor. ~0.84 target load; build failure doubles m and retries
(deterministic, no RNG state anywhere).

Scale: shards are built executor-side (applyInPandas over the seen
table grouped by host_hash shard, like the blooms), serialized as one
bytes column, collected (2 bytes/slot: ~2.4 MB per 10^6-URL shard at
0.84 load) and broadcast. The probe is one vectorized numpy gather
per Arrow batch. The 10^10 regime note in operators/seen.py applies
unchanged: beyond broadcastable sizes the co-partitioned compacted
layout is the right physical knob, with per-bucket filters built
inside the bucket's task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4
_FP_ODD = np.uint64(0x5BD1E995)  # odd multiplier spreads fp over buckets
_MAX_KICKS = 500

_CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("m", T.LongType()),
        T.StructField("table", T.BinaryType()),
    ]
)


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    fp = (hashes >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 means empty slot
    return fp


def _bucket1(hashes: np.ndarray, m: int) -> np.ndarray:
    return (hashes & np.uint64(m - 1)).astype(np.int64)


def _alt_bucket(idx: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    mix = (fp.astype(np.uint64) * _FP_ODD) & np.uint64(m - 1)
    return (idx.astype(np.uint64) ^ mix).astype(np.int64)


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


def build_cuckoo_table(
    hashes: np.ndarray, load: float = 0.84
) -> tuple[int, np.ndarray]:
    """(m, table[m, SLOTS] uint16) for the given 64-bit hashes.
    Deterministic; doubles m and rebuilds on kick-walk failure."""
    hashes = np.unique(hashes.astype(np.uint64))
    n = max(1, len(hashes))
    m = _next_pow2(int(np.ceil(n / (SLOTS * load))))
    fps_all = _fingerprints(hashes)
    odd = int(_FP_ODD)
    while True:
        # fingerprints/buckets precomputed vectorized; the placement walk
        # itself runs on plain Python ints over a flat list — per-key
        # numpy scalar round-trips would cost ~100x at the documented
        # ~10^6-URL shard size (filter builds happen every round).
        mask = m - 1
        tbl = [0] * (m * SLOTS)
        b1s = (hashes & np.uint64(mask)).astype(np.int64).tolist()
        ok = True
        for fp, i1 in zip(fps_all.tolist(), b1s):
            i2 = i1 ^ ((fp * odd) & mask)
            placed = False
            for b in (i1, i2):
                base = b * SLOTS
                for s in range(SLOTS):
                    if tbl[base + s] == 0:
                        tbl[base + s] = fp
                        placed = True
                        break
                if placed:
                    break
            if placed:
                continue
            # deterministic kick walk from i1
            cur, cur_fp = i1, fp
            for kick in range(_MAX_KICKS):
                idx = cur * SLOTS + kick % SLOTS
                cur_fp, tbl[idx] = tbl[idx], cur_fp
                cur = cur ^ ((cur_fp * odd) & mask)
                base = cur * SLOTS
                done = False
                for s in range(SLOTS):
                    if tbl[base + s] == 0:
                        tbl[base + s] = cur_fp
                        done = True
                        break
                if done:
                    break
            else:
                ok = False
            if not ok:
                break
        if ok:
            return m, np.asarray(tbl, dtype=np.uint16).reshape(m, SLOTS)
        m *= 2  # too full / pathological kicks: grow and rebuild


def probe_cuckoo(
    hashes: np.ndarray, m: int, table: np.ndarray
) -> np.ndarray:
    """Vectorized membership: True = maybe present (false positives
    possible, false negatives impossible for inserted keys)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    h = hashes.astype(np.uint64)
    fp = _fingerprints(h)
    i1 = _bucket1(h, m)
    i2 = _alt_bucket(i1, fp, m)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[i2] == fp[:, None]).any(axis=1)
    return hit


def delete_cuckoo(m: int, table: np.ndarray, hashes: np.ndarray) -> int:
    """Remove ONE stored copy of each hash's fingerprint (the cuckoo
    filter's deletion property — blooms cannot do this). Returns how
    many were actually removed; deleting a never-inserted key can
    remove a colliding twin, so only delete keys known to be present
    (the TTL-expiry path satisfies this by construction)."""
    h = np.asarray(hashes, dtype=np.uint64)
    fps = _fingerprints(h)
    mask = m - 1
    odd = int(_FP_ODD)
    removed = 0
    for fp, i1 in zip(fps.tolist(), (h & np.uint64(mask)).astype(np.int64).tolist()):
        i2 = i1 ^ ((fp * odd) & mask)
        done = False
        for b in (i1, i2):
            row = table[b]
            for s in range(SLOTS):
                if row[s] == fp:
                    row[s] = 0
                    removed += 1
                    done = True
                    break
            if done:
                break
    return removed


def planned_cuckoo_bytes(shard_counts: dict[int, int], load: float = 0.84) -> int:
    """Planned total table bytes build_cuckoo_shards would materialize
    for the given per-shard row counts: the sizing formula with the
    pre-dedup count (n_unique <= n and _next_pow2 is monotone). A
    kick-walk failure doubles a shard's m AFTER this estimate, so the
    plan is not a strict bound — build_cuckoo_shards re-checks the
    ACTUAL built bytes against the cap before returning."""
    return sum(
        _next_pow2(int(np.ceil(max(1, n) / (SLOTS * load)))) * SLOTS * 2
        for n in shard_counts.values()
    )


def build_cuckoo_shards(
    seen: DataFrame, load: float = 0.84, max_total_bytes: int | None = None
) -> dict[int, tuple[int, bytes]] | None:
    """Per-host_hash-shard cuckoo tables over seen(url_hash, host_hash);
    {shard: (m, table_bytes)} for sparkContext.broadcast — the same
    shape and build path as operators/seen.build_bloom_shards, including
    the ``max_total_bytes`` guard (planned size checked from a cheap
    count aggregation BEFORE building; None = use the exact anti-join
    alone — see CrawlConfig.prefilter_max_bytes)."""
    if max_total_bytes is not None:
        from pathik_spark.operators.seen import shard_counts as _counts

        if planned_cuckoo_bytes(_counts(seen), load) > max_total_bytes:
            return None

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        m, table = build_cuckoo_table(hashes, load=load)
        return pd.DataFrame(
            {
                "shard": [int(pdf["host_hash"].iloc[0])],
                "m": [m],
                "table": [table.tobytes()],
            }
        )

    rows = (
        seen.select("url_hash", "host_hash")
        .groupBy("host_hash")
        .applyInPandas(_build, _CUCKOO_SCHEMA)
        .collect()
    )
    out = {r["shard"]: (r["m"], bytes(r["table"])) for r in rows}
    if max_total_bytes is not None:
        # the pre-build plan is not a strict bound (kick-walk failure
        # doubles a shard after planning) — enforce the cap on what was
        # ACTUALLY built before it becomes a driver-resident broadcast
        if sum(len(t) for (_, t) in out.values()) > max_total_bytes:
            return None
    return out


def cuckoo_seen_filter(
    frontier: DataFrame,
    seen: DataFrame | None,
    cuckoo_shards_bc=None,
) -> DataFrame:
    """Exact-anti-join URL-seen with the cuckoo pre-filter: identical
    composition (and therefore identical OUTPUT) to seen.seen_filter —
    misses bypass the join entirely, hits are verified exactly."""
    if seen is None:
        return frontier
    seen_keys = seen.select("url_hash").distinct()
    if cuckoo_shards_bc is None:
        return frontier.join(seen_keys, "url_hash", "left_anti")

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series, host_hash: pd.Series) -> pd.Series:
        shards = cuckoo_shards_bc.value
        hashes = url_hash.to_numpy(dtype=np.int64).view(np.uint64)
        out = np.zeros(len(url_hash), dtype=bool)
        for shard, grp in pd.Series(range(len(host_hash))).groupby(
            host_hash.to_numpy()
        ):
            entry = shards.get(int(shard))
            if entry is None:
                continue
            m, raw = entry
            table = np.frombuffer(raw, dtype=np.uint16).reshape(m, SLOTS)
            sel = grp.to_numpy()
            out[sel] = probe_cuckoo(hashes[sel], m, table)
        return pd.Series(out)

    flagged = frontier.withColumn(
        "_maybe_seen", maybe_seen(F.col("url_hash"), F.col("host_hash"))
    )
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspects = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    survivors = suspects.join(seen_keys, "url_hash", "left_anti")
    return definitely_new.unionByName(survivors)


def expire_shards(
    shards: dict[int, tuple[int, bytes]],
    expired_by_shard: dict[int, np.ndarray],
) -> dict[int, tuple[int, bytes]]:
    """TTL maintenance between rounds: delete expired url_hashes from
    their shards WITHOUT a rebuild (the deletion property blooms lack).
    Returns a new dict (tables are copy-on-write; the broadcast value
    is immutable)."""
    out = dict(shards)
    for shard, hashes in expired_by_shard.items():
        entry = shards.get(int(shard))
        if entry is None or len(hashes) == 0:
            continue
        m, raw = entry
        table = np.frombuffer(raw, dtype=np.uint16).reshape(m, SLOTS).copy()
        delete_cuckoo(m, table, hashes)
        out[int(shard)] = (m, table.tobytes())
    return out
