"""Crawl snapshot diffing: what changed between two crawls of the web.

Freshness pipelines decide re-crawl budgets from the delta between
snapshot k-1 and snapshot k: which URLs appeared, vanished, changed
content, or stayed identical. ``crawl_delta`` computes the per-URL
verdict; ``delta_stats`` rolls it up per host (the re-crawl scheduler's
input — hosts that churn get shorter TTLs, cf. operators/seen.
recrawl_filter).

Shape at scale: a full outer join keyed by url_hash — the SAME key and
bucket layout as the pages/seen tables (plans/driver._prepared_pages),
so when both snapshots are stored bucketed the join is co-located and
shuffle-free; content equality is a column compare on the already-
stored content hash (no re-extraction, no re-hashing of bodies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_ADDED = "added"
CHANGE_REMOVED = "removed"
CHANGE_MODIFIED = "modified"
CHANGE_UNCHANGED = "unchanged"


def crawl_delta(
    prev: DataFrame,
    cur: DataFrame,
    key_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, change, prev_hash, cur_hash): the per-URL snapshot diff.

    change ∈ {added, removed, modified, unchanged}. Inputs need
    (key_col, hash_col); extra columns are ignored. Keys must be unique
    per snapshot (they are: pages tables key by canonical url)."""
    p = prev.select(F.col(key_col).alias("url"), F.col(hash_col).alias("prev_hash"))
    c = cur.select(F.col(key_col).alias("url"), F.col(hash_col).alias("cur_hash"))
    joined = p.join(c, "url", "full_outer")
    change = (
        F.when(F.col("prev_hash").isNull(), F.lit(CHANGE_ADDED))
        .when(F.col("cur_hash").isNull(), F.lit(CHANGE_REMOVED))
        .when(F.col("prev_hash") == F.col("cur_hash"), F.lit(CHANGE_UNCHANGED))
        .otherwise(F.lit(CHANGE_MODIFIED))
    )
    return joined.select("url", change.alias("change"), "prev_hash", "cur_hash")


def delta_stats(delta: DataFrame, host_expr=None) -> DataFrame:
    """Per-host churn rollup: (host, n_added, n_removed, n_modified,
    n_unchanged, churn) where churn = changed / total — the re-crawl
    TTL signal. ``host_expr`` defaults to the engine's domain kernel."""
    if host_expr is None:
        from pathik_spark.functions.urls import hostname_of

        host_expr = hostname_of(F.col("url"))
    counts = {
        c: F.coalesce(
            F.sum(F.when(F.col("change") == c, 1).otherwise(0)), F.lit(0)
        ).cast("long")
        for c in (CHANGE_ADDED, CHANGE_REMOVED, CHANGE_MODIFIED, CHANGE_UNCHANGED)
    }
    agg = delta.groupBy(host_expr.alias("host")).agg(
        *[v.alias(f"n_{k}") for k, v in counts.items()]
    )
    total = (
        F.col("n_added") + F.col("n_removed") + F.col("n_modified") + F.col("n_unchanged")
    )
    changed = F.col("n_added") + F.col("n_removed") + F.col("n_modified")
    return agg.select(
        "*",
        F.round(changed.cast("double") / total.cast("double"), 6).alias("churn"),
    )
