"""Structured-Streaming surface (S6-S8 semantics, SURVEY.md §3.2).

On a real cluster the artifacts stream goes out via
``writeStream.format("kafka")`` with the exact (key, value, headers)
columns produced by sources/sinks.kafka_message_rows — the sandbox has
no broker, so the streaming path is exercised with file sources and the
memory sink (same logical plan, same schema; the reference's own Python
binding similarly falls back to a simulation when no broker is
reachable, pathik/__init__.py:211-262).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_kafka_rows_from_dir(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """readStream over a parquet dir of kafka-shaped rows."""
    return spark.readStream.schema(schema).parquet(path)


def write_kafka_stream(
    messages: DataFrame,
    brokers: str | None,
    topic: str,
    checkpoint_dir: str,
    compression: str = "gzip",
):
    """Real-cluster sink: kafka format with the reference's compression
    options (kafka.go:152-165). Raises if no brokers configured."""
    if not brokers:
        raise RuntimeError("no Kafka brokers configured; use the table sink in-sandbox")
    return (
        messages.selectExpr("key", "value", "headers")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.compression.type", compression)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_host_metrics(pages_stream: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Watermarked per-host rollup over a stream of fetched pages —
    the streaming twin of operators/metrics.host_metrics."""
    return (
        pages_stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", "bytes")
    )
