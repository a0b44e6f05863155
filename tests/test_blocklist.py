"""Tests for host-blocklist / URL-keyword filtering (operators/blocklist.py)
and the deterministic hash split (operators/sampling.hash_split)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.blocklist import host_blocklist_filter, url_keyword_filter
from pathik_spark.operators.sampling import hash_split


def _urls(spark):
    return spark.createDataFrame(
        [
            (1, "https://good.example.com/a"),
            (2, "https://tracker.example.net/x"),  # exact blocklist hit
            (3, "https://cdn.ads.tracker.example.net/y"),  # subdomain of a hit
            (4, "https://TRACKER.EXAMPLE.NET/z"),  # case-insensitive
            (5, "https://nottracker.example.net/w"),  # substring, NOT a suffix
            (6, "https://example.net/v"),  # parent of a hit: clean
        ],
        "id long, url string",
    )


def _bl(spark):
    return spark.createDataFrame([("tracker.example.net",)], "host string")


def test_host_blocklist_subdomain_semantics(spark):
    kept = sorted(r["id"] for r in host_blocklist_filter(_urls(spark), _bl(spark)).collect())
    assert kept == [1, 5, 6]


def test_host_blocklist_diagnostics_mode(spark):
    got = {
        r["id"]: r["blocked_host"]
        for r in host_blocklist_filter(_urls(spark), _bl(spark), keep_blocked=True).collect()
    }
    assert got[2] == "tracker.example.net"
    assert got[3] == "tracker.example.net"
    assert got[4] == "tracker.example.net"
    assert got[1] is None and got[5] is None and got[6] is None


def test_host_blocklist_plan_has_no_frontier_shuffle(spark):
    plan = host_blocklist_filter(_urls(spark), _bl(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_url_keyword_filter(spark):
    df = spark.createDataFrame(
        [(1, "https://a.example/page"), (2, "https://b.example/CASINO-night"), (3, "https://c.example/setup.exe")],
        "id long, url string",
    )
    kept = [r["id"] for r in url_keyword_filter(df, ["casino", ".exe"]).collect()]
    assert kept == [1]
    with pytest.raises(ValueError):
        url_keyword_filter(df, [])


def test_hash_split_deterministic_and_disjoint(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(2000)], "url string")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # repartitioning does not change assignments
    again = {
        r["url"]: r["split"] for r in hash_split(df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    first = {r["url"]: r["split"] for r in out.collect()}
    assert first == again


def test_hash_split_weight_validation(spark):
    df = spark.createDataFrame([("a",)], "url string")
    with pytest.raises(ValueError):
        hash_split(df, {"train": 0.5, "val": 0.1})
