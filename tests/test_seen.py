"""URL-seen filter (J3/B2): bloom-sharded pre-filter must be exactly
equivalent to the authoritative anti-join (property per SURVEY.md §7-M3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.operators.frontier import prepare_frontier
from pathik_spark.operators.seen import build_bloom_shards, seen_filter


def _frontier(corpus):
    return prepare_frontier(corpus["seeds"], num_shards=32)


def test_anti_join_semantics(spark, corpus):
    fr = _frontier(corpus).cache()
    # mark every other canonical url as seen
    seen = fr.filter(F.col("seq") % 2 == 0).select("url_hash", "host_hash", "url")
    out = seen_filter(fr, seen)
    left = {r["url_hash"] for r in out.select("url_hash").collect()}
    expected = {
        r["url_hash"] for r in fr.filter(F.col("seq") % 2 != 0).select("url_hash").collect()
    } - {r["url_hash"] for r in seen.select("url_hash").collect()}
    assert left == expected


def test_bloom_prefilter_equals_exact(spark, corpus):
    fr = _frontier(corpus).cache()
    seen = fr.filter(F.col("seq") % 3 == 0).select("url_hash", "host_hash", "url")
    exact = seen_filter(fr, seen)
    shards = build_bloom_shards(seen, fpp=0.05)
    assert shards, "bloom shards built"
    bc = spark.sparkContext.broadcast(shards)
    accelerated = seen_filter(fr, seen, bc)
    a = sorted(r["url_hash"] for r in exact.select("url_hash").collect())
    b = sorted(r["url_hash"] for r in accelerated.select("url_hash").collect())
    assert a == b


def test_bloom_has_no_false_negatives(spark, corpus):
    fr = _frontier(corpus).cache()
    seen = fr.limit(50).select("url_hash", "host_hash", "url")
    shards = build_bloom_shards(seen)
    bc = spark.sparkContext.broadcast(shards)
    out = seen_filter(fr, seen, bc)
    seen_hashes = {r["url_hash"] for r in seen.collect()}
    surviving = {r["url_hash"] for r in out.select("url_hash").collect()}
    assert not (surviving & seen_hashes)


def test_none_seen_passthrough(spark, corpus):
    fr = _frontier(corpus)
    assert seen_filter(fr, None) is fr


def test_recrawl_filter_readmits_stale_seen(spark, corpus):
    from pathik_spark.operators.seen import recrawl_filter

    fr = _frontier(corpus).cache()
    # every other url seen: half of those long ago (stale), half just now
    seen = (
        fr.filter(F.col("seq") % 2 == 0)
        .select("url_hash", "host_hash")
        .withColumn(
            "seen_ts",
            F.when(F.pmod(F.col("url_hash"), F.lit(2)) == 0, F.lit(100)).otherwise(
                F.lit(10_000)
            ),
        )
    )
    out = recrawl_filter(fr, seen, cutoff=F.lit(5_000), ts_col="seen_ts")
    got = {r["url_hash"] for r in out.select("url_hash").collect()}
    fresh_blocked = {
        r["url_hash"]
        for r in seen.filter(F.col("seen_ts") >= 5_000).select("url_hash").collect()
    }
    all_fr = {r["url_hash"] for r in fr.select("url_hash").collect()}
    assert got == all_fr - fresh_blocked
    # stale-seen urls ARE re-admitted (they were seen, but expired)
    stale = {
        r["url_hash"]
        for r in seen.filter(F.col("seen_ts") < 5_000).select("url_hash").collect()
    }
    assert stale - fresh_blocked <= got


def test_recrawl_filter_composes_with_full_set_bloom(spark, corpus):
    from pathik_spark.operators.seen import recrawl_filter

    fr = _frontier(corpus).cache()
    seen = (
        fr.filter(F.col("seq") % 3 == 0)
        .select("url_hash", "host_hash")
        .withColumn(
            "seen_ts",
            F.when(F.pmod(F.col("url_hash"), F.lit(2)) == 0, F.lit(100)).otherwise(
                F.lit(10_000)
            ),
        )
    )
    # bloom built over the FULL seen set (as the driver does), TTL applied inside
    shards = build_bloom_shards(seen, fpp=0.05)
    bc = spark.sparkContext.broadcast(shards)
    with_bloom = recrawl_filter(fr, seen, cutoff=F.lit(5_000), bloom_shards_bc=bc, ts_col="seen_ts")
    without = recrawl_filter(fr, seen, cutoff=F.lit(5_000), ts_col="seen_ts")
    a = {r["url_hash"] for r in with_bloom.select("url_hash").collect()}
    b = {r["url_hash"] for r in without.select("url_hash").collect()}
    assert a == b

def test_prefilter_cap_boundary(spark, corpus):
    """max_total_bytes: at the exact planned size the build proceeds;
    one byte below it falls through to None, and composition with
    seen_filter(None) stays exactly the authoritative anti-join."""
    from pathik_spark.operators.seen import planned_bloom_bytes, shard_counts

    fr = _frontier(corpus).cache()
    seen = fr.filter(F.col("seq") % 3 == 0).select("url_hash", "host_hash", "url")
    planned = planned_bloom_bytes(shard_counts(seen), fpp=0.05)
    assert planned > 0
    at_cap = build_bloom_shards(seen, fpp=0.05, max_total_bytes=planned)
    assert at_cap is not None
    # the planned number is exact: the built bitsets sum to it
    assert sum(len(bits) for (_, _, bits) in at_cap.values()) == planned
    below_cap = build_bloom_shards(seen, fpp=0.05, max_total_bytes=planned - 1)
    assert below_cap is None
    exact = seen_filter(fr, seen, None)
    bc = spark.sparkContext.broadcast(at_cap)
    a = sorted(r["url_hash"] for r in exact.select("url_hash").collect())
    b = sorted(
        r["url_hash"] for r in seen_filter(fr, seen, bc).select("url_hash").collect()
    )
    assert a == b


def test_cuckoo_cap_boundary(spark, corpus):
    from pathik_spark.operators.cuckoo import (
        build_cuckoo_shards,
        planned_cuckoo_bytes,
    )
    from pathik_spark.operators.seen import shard_counts

    fr = _frontier(corpus).cache()
    seen = fr.filter(F.col("seq") % 3 == 0).select("url_hash", "host_hash", "url")
    planned = planned_cuckoo_bytes(shard_counts(seen))
    at_cap = build_cuckoo_shards(seen, max_total_bytes=planned)
    assert at_cap is not None
    # planned is an upper bound on what was actually materialized
    assert sum(len(tbl) for (_, tbl) in at_cap.values()) <= planned
    assert build_cuckoo_shards(seen, max_total_bytes=0) is None
