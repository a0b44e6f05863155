"""Seed-list intake (S1) from the formats a crawl operator actually has:
plain text URL lists (the reference's CLI arg list / file, main.go:138-148),
CSV, JSON-lines, or an existing table. All normalize to the seeds schema
``(url string, seq long, priority int)`` with seq = input order (the
FIFO tiebreak the ordering oracle expects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathik_spark.operators.scheduler import scalable_global_rank

SEEDS_SCHEMA = "url string, seq long, priority int"


def seeds_from_list(spark: SparkSession, urls: list[str], priority: int = 0) -> DataFrame:
    rows = [(u, i, priority) for i, u in enumerate(urls)]
    return spark.createDataFrame(rows, SEEDS_SCHEMA)


def seeds_from_text(spark: SparkSession, path: str, priority: int = 0) -> DataFrame:
    """One URL per line; blank lines and #-comments skipped; seq = global
    line order (scalable two-phase rank, no single-partition window)."""
    lines = spark.read.text(path).select(F.trim("value").alias("url"))
    lines = lines.filter((F.col("url") != "") & ~F.col("url").startswith("#"))
    ranked = scalable_global_rank(lines, ["url"], "_r")  # order: lexicographic (deterministic)
    return ranked.select(
        "url", (F.col("_r") - 1).cast("long").alias("seq"), F.lit(priority).alias("priority")
    )


def seeds_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header url[,priority]; seq assigned by (priority, url)."""
    df = spark.read.option("header", "true").csv(path)
    if "priority" not in df.columns:
        df = df.withColumn("priority", F.lit(0))
    df = df.select("url", F.col("priority").cast("int"))
    ranked = scalable_global_rank(df, ["priority", "url"], "_r")
    return ranked.select("url", (F.col("_r") - 1).cast("long").alias("seq"), "priority")


def seeds_from_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with fields url, optional seq/priority."""
    df = spark.read.json(path)
    if "priority" not in df.columns:
        df = df.withColumn("priority", F.lit(0))
    if "seq" in df.columns:
        return df.select("url", F.col("seq").cast("long"), F.col("priority").cast("int"))
    ranked = scalable_global_rank(df.select("url", "priority"), ["priority", "url"], "_r")
    return ranked.select("url", (F.col("_r") - 1).cast("long").alias("seq"), F.col("priority").cast("int"))
