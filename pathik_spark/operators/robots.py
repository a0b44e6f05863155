"""Robots / politeness control-table join (J4/B3 — new-build per
north_rule; nearest reference anchor is the global limiter
crawler/crawler.go:26).

The robots table is per-host and small relative to the frontier
(≤ hundreds of millions of hosts vs 10^10 URLs), so the join is an
explicit ``broadcast`` hash join — no shuffle of the frontier side.
Disallow rules are evaluated with the built-in ``exists`` higher-order
function on the path column (codegen'd, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions import urls as U

DEFAULT_CRAWL_DELAY_MS = 0
DEFAULT_MAX_PER_ROUND = 1_000_000_000


def attach_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Left-join per-host budgets; hosts without a robots row get the
    defaults (crawl ok, no delay)."""
    rb = robots.select(
        "host",
        F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms"),
        "disallow_prefixes",
        F.col("max_per_round").cast("int").alias("max_per_round"),
    )
    joined = frontier.join(F.broadcast(rb), "host", "left")
    return joined.select(
        frontier["*"],
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
            "crawl_delay_ms"
        ),
        F.coalesce(F.col("max_per_round"), F.lit(DEFAULT_MAX_PER_ROUND)).alias(
            "max_per_round"
        ),
        F.coalesce(F.col("disallow_prefixes"), F.array()).alias("disallow_prefixes"),
    )


def filter_disallowed(frontier_with_robots: DataFrame) -> DataFrame:
    """Drop URLs whose path starts with any disallowed prefix."""
    path = U.path_of(F.col("url"))
    blocked = F.exists(
        F.col("disallow_prefixes"), lambda p: F.startswith(path, p)
    )
    return frontier_with_robots.filter(~blocked).drop("disallow_prefixes")
