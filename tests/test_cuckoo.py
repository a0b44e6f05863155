"""Cuckoo-filter URL-seen pre-filter (operators/cuckoo.py): exact
anti-join equivalence, no false negatives, deletion property."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pathik_spark.operators.cuckoo import (
    build_cuckoo_shards,
    build_cuckoo_table,
    cuckoo_seen_filter,
    delete_cuckoo,
    expire_shards,
    probe_cuckoo,
)
from pathik_spark.operators.frontier import prepare_frontier
from pathik_spark.operators.seen import seen_filter


def _hashes(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 2**63 - 1, size=n, dtype=np.int64
    ).astype(np.uint64)


def test_table_no_false_negatives_and_low_fp():
    keys = _hashes(50_000, 1)
    m, table = build_cuckoo_table(keys)
    assert probe_cuckoo(keys, m, table).all()  # every inserted key hits
    others = _hashes(50_000, 2)
    fresh = others[~np.isin(others, keys)]
    fp_rate = probe_cuckoo(fresh, m, table).mean()
    assert fp_rate < 0.01, fp_rate  # 16-bit fp, 2x4 slots -> ~0.1% expected


def test_table_build_deterministic():
    keys = _hashes(10_000, 3)
    m1, t1 = build_cuckoo_table(keys)
    m2, t2 = build_cuckoo_table(keys)
    assert m1 == m2 and np.array_equal(t1, t2)


def test_delete_removes_membership():
    keys = _hashes(20_000, 4)
    m, table = build_cuckoo_table(keys)
    victims = keys[:500]
    removed = delete_cuckoo(m, table, victims)
    assert removed == 500
    # deleted keys gone (barring a same-fp twin in the same buckets —
    # statistically absent at this size), survivors untouched
    assert probe_cuckoo(victims, m, table).mean() < 0.01
    assert probe_cuckoo(keys[500:], m, table).all()


def test_cuckoo_prefilter_equals_exact(spark, corpus):
    fr = prepare_frontier(corpus["seeds"], num_shards=32).cache()
    seen = fr.filter(F.col("seq") % 3 == 0).select("url_hash", "host_hash", "url")
    exact = seen_filter(fr, seen)
    shards = build_cuckoo_shards(seen)
    assert shards
    bc = spark.sparkContext.broadcast(shards)
    accelerated = cuckoo_seen_filter(fr, seen, bc)
    a = sorted(r["url_hash"] for r in exact.select("url_hash").collect())
    b = sorted(r["url_hash"] for r in accelerated.select("url_hash").collect())
    assert a == b


def test_crawl_run_cuckoo_equals_bloom(spark, corpus, tmp_path):
    """The pre-filter backend is a pure physical knob: a crawl
    configured with seen_prefilter='cuckoo' produces byte-identical
    rounds to the bloom run (bloom_min_seen=0 forces both through the
    sharded fast path)."""
    from pathik_spark.config import CrawlConfig
    from pathik_spark.plans.driver import CrawlRun

    stats, arts = {}, {}
    for kind in ("bloom", "cuckoo"):
        run = CrawlRun(
            spark,
            pages=corpus["pages"],
            robots=corpus["robots"],
            links=corpus["links"],
            state_dir=str(tmp_path / kind),
            config=CrawlConfig(
                run_id=f"ck-{kind}", n_rounds=2, bloom_min_seen=0,
                seen_prefilter=kind,
            ),
        )
        st = run.run(corpus["seeds"], n_rounds=2)
        stats[kind] = [(s.scheduled, s.fetched, s.seen_total) for s in st]
        a = run.store.read_table(1, "artifacts")
        cols = sorted(a.columns)
        arts[kind] = sorted(map(tuple, a.select(*cols).collect()))
    assert stats["bloom"] == stats["cuckoo"]
    assert arts["bloom"] == arts["cuckoo"]


def test_expire_shards_reopens_prefilter(spark, corpus):
    """After TTL expiry the exact join re-admits the URL; expire_shards
    keeps the PRE-filter consistent so the re-admitted row routes as a
    miss (no decay of the maybe-seen hit rate as the crawl ages)."""
    fr = prepare_frontier(corpus["seeds"], num_shards=32).cache()
    seen = fr.filter(F.col("seq") % 3 == 0).select(
        "url_hash", "host_hash", "url"
    ).cache()
    shards = build_cuckoo_shards(seen)
    expired_rows = seen.filter(F.col("url_hash") % 2 == 0).collect()
    by_shard: dict[int, list[int]] = {}
    for r in expired_rows:
        by_shard.setdefault(r["host_hash"], []).append(r["url_hash"])
    pruned = expire_shards(
        shards,
        {s: np.array(v, dtype=np.int64).view(np.uint64) for s, v in by_shard.items()},
    )
    # original dict untouched (broadcast immutability)
    import numpy as _np

    for s, (m, raw) in pruned.items():
        if s in by_shard:
            assert raw != shards[s][1]
        tbl = _np.frombuffer(raw, dtype=_np.uint16).reshape(m, 4)
        victims = _np.array(by_shard.get(s, []), dtype=_np.int64).view(_np.uint64)
        if len(victims):
            assert probe_cuckoo(victims, m, tbl).mean() < 0.05
    # still-fresh keys keep hitting
    fresh = seen.filter(F.col("url_hash") % 2 != 0).collect()
    for r in fresh:
        m, raw = pruned[r["host_hash"]]
        tbl = _np.frombuffer(raw, dtype=_np.uint16).reshape(m, 4)
        assert probe_cuckoo(
            _np.array([r["url_hash"]], dtype=_np.int64).view(_np.uint64), m, tbl
        ).all()
