"""Streaming operators: watermarked dedup + stateful per-host budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.streaming.stateful import stateful_host_budget, streaming_seen_filter


def _frontier_stream(spark, tmp_path, n=60):
    rows = [
        (f"https://host{i % 4}.example/p{i % 20}", f"host{i % 4}.example", i % 20 + 1000 * (i % 4), "2025-03-01 00:00:%02d" % (i % 60))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, url_hash long, event_ts string"
    ).withColumn("event_ts", F.to_timestamp("event_ts"))
    path = str(tmp_path / "stream_src")
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_streaming_seen_filter(spark, tmp_path):
    stream = _frontier_stream(spark, tmp_path)
    out = streaming_seen_filter(stream)
    q = out.writeStream.format("memory").queryName("seen_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        hashes = [r["url_hash"] for r in spark.sql("SELECT url_hash FROM seen_stream").collect()]
        # 60 input rows collapse to the 20 distinct url_hash values
        # (url_hash is a function of i % 20), each exactly once
        assert sorted(hashes) == sorted(set(hashes))
        assert len(hashes) == 20
    finally:
        q.stop()


def test_stateful_host_budget(spark, tmp_path):
    stream = _frontier_stream(spark, tmp_path, n=60)
    out = stateful_host_budget(stream.select("host", "url", "url_hash"), max_per_host=5)
    q = out.writeStream.format("memory").queryName("budget_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT host, COUNT(*) AS n, MAX(n_admitted) AS mx FROM budget_stream GROUP BY host").collect()
        assert rows, "no output"
        for r in rows:
            assert r["n"] <= 5 and r["mx"] <= 5, r
    finally:
        q.stop()
