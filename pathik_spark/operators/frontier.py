"""Frontier preparation: validation (F1/F2), canonicalization (B1) and
hashing, producing the canonical frontier schema used by every later
operator:

    url_raw   string  -- as submitted (seed list / discovered link)
    url       string  -- canonical form (join/dedup identity)
    host      string
    url_hash  long    -- xxhash64(url)
    host_hash long    -- pmod(xxhash64(host), num_shards)
    priority  int
    seq       long    -- FIFO tiebreak (seed order / discovery order)
    attempt   int     -- retry counter (W3, crawler.go:173-224 semantics)

Scale notes: validation + hashing are pure codegen'd expressions; the
only Python is the canonicalization pandas UDF (Arrow-batched). The
frontier is explicitly repartitioned by host_hash so the politeness
groupBy and the fetch join reuse one partitioning (north_rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions import urls as U

NUM_SHARDS_DEFAULT = 4096


def prepare_frontier(
    seeds: DataFrame,
    num_shards: int = NUM_SHARDS_DEFAULT,
    attempt: int = 0,
) -> DataFrame:
    """seeds(url, seq, priority) -> canonical frontier rows.

    Invalid URLs (F1) are dropped *before* the canonicalization UDF runs
    (cheap JVM filter first); duplicate canonical URLs collapse to the
    lowest (priority, seq) — mirroring "first occurrence wins" FIFO
    semantics of the reference's seed list (main.go:138-148).
    """
    canon = (
        seeds.filter(U.is_valid_url_expr(F.col("url")))
        .withColumn("url_raw", F.col("url"))
        .withColumn("url", U.canonical_col(F.col("url")))
        .filter(F.col("url").isNotNull())
    )
    has_attempt = "attempt" in seeds.columns
    if not has_attempt:
        canon = canon.withColumn("attempt", F.lit(attempt))
    order_key = F.struct("priority", "seq")
    dedup = canon.groupBy("url").agg(
        F.min_by("url_raw", order_key).alias("url_raw"),
        F.min_by("attempt", order_key).alias("attempt"),
        F.min(order_key).alias("_ps"),
    )
    return (
        dedup.select(
            "url_raw",
            "url",
            "attempt",
            F.col("_ps.priority").alias("priority"),
            F.col("_ps.seq").alias("seq"),
        )
        .withColumn("host", U.hostname_of(F.col("url")))
        .withColumn("url_hash", U.url_hash_expr(F.col("url")))
        .withColumn("host_hash", U.host_hash_expr(F.col("host"), num_shards))
    )
