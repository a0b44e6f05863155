"""Per-host fetch metrics (A3) + per-partition lineage (B6) — new-build
per north_rule; the reference only prints to stdout
(crawler.go:277,291, storage.go:264).

Both are pure aggregations appended to metrics tables each round:
- host metrics: groupBy(host_hash, host) — counts, bytes, error counts;
- partition lineage: groupBy(spark_partition_id()) recorded on the
  artifacts output, so a row can be traced to (run_id, round,
  partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_metrics(artifacts: DataFrame, run_id: str, round_no: int) -> DataFrame:
    return (
        artifacts.groupBy("host_hash", "host")
        .agg(
            F.count("*").alias("n_urls"),
            F.count(F.when(F.col("status") == "fetched", 1)).alias("n_fetched"),
            F.count(F.when(F.col("status") != "fetched", 1)).alias("n_errors"),
            F.coalesce(F.sum("bytes_fetched"), F.lit(0)).alias("bytes_fetched"),
            F.coalesce(F.avg("bytes_fetched"), F.lit(0.0)).alias("avg_bytes"),
            F.max("scheduled_ms").alias("horizon_ms"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("round", F.lit(round_no))
    )


def partition_lineage(artifacts: DataFrame, run_id: str, round_no: int) -> DataFrame:
    return (
        artifacts.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.approx_count_distinct("host_hash").alias("n_host_shards"),
            F.min("url_hash").alias("min_url_hash"),
            F.max("url_hash").alias("max_url_hash"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("round", F.lit(round_no))
    )
