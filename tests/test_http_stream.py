"""Streaming twin of the HTTP-layer analysis (streaming/http_stream.py):
stream==batch parity for the stateless parses, foreachBatch Retry-After
overlay across micro-batches."""

from __future__ import annotations

import datetime as dt

from pathik_spark.streaming.http_stream import (
    RESPONSE_STREAM_SCHEMA,
    cache_ttl_stream,
    http_meta_stream,
    make_retry_after_batch_processor,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _resp(status_line: str, headers: list[str], body: bytes = b"x") -> bytes:
    return (
        "\r\n".join([status_line, *headers]).encode("ascii") + b"\r\n\r\n" + body
    )


ROWS = [
    ("http://s.example/redir", TS, _resp("HTTP/1.1 302 Found", ["Location: /next"])),
    (
        "http://s.example/cached",
        TS,
        _resp("HTTP/1.1 200 OK", ["Cache-Control: max-age=7200", 'ETag: "e"']),
    ),
    ("http://s.example/busy", TS, _resp("HTTP/1.1 429 Too Many", ["Retry-After: 45"])),
]


def _write_batch(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, RESPONSE_STREAM_SCHEMA).write.mode(mode).parquet(
        path
    )


def test_http_stream_matches_batch(spark, tmp_path):
    from pathik_spark.operators.redirects import http_response_meta
    from pathik_spark.operators.revalidate import cache_ttl_hours, http_cache_meta

    path = str(tmp_path / "resp_src")
    _write_batch(spark, path, ROWS, mode="overwrite")
    stream = spark.readStream.schema(RESPONSE_STREAM_SCHEMA).parquet(path)
    q1 = (
        http_meta_stream(stream)
        .writeStream.format("memory")
        .queryName("http_meta_s")
        .outputMode("append")
        .start()
    )
    q2 = (
        cache_ttl_stream(stream)
        .writeStream.format("memory")
        .queryName("http_ttl_s")
        .outputMode("append")
        .start()
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        batch_df = spark.createDataFrame(ROWS, RESPONSE_STREAM_SCHEMA)
        want_meta = {
            tuple(r) for r in http_response_meta(batch_df).collect()
        }
        got_meta = {
            tuple(r)
            for r in spark.sql("SELECT * FROM http_meta_s").collect()
        }
        assert got_meta == want_meta
        want_ttl = {
            tuple(r) for r in cache_ttl_hours(http_cache_meta(batch_df)).collect()
        }
        got_ttl = {
            tuple(r) for r in spark.sql("SELECT * FROM http_ttl_s").collect()
        }
        assert got_ttl == want_ttl
    finally:
        q1.stop()
        q2.stop()


def test_retry_after_foreach_batch_overlay(spark, tmp_path):
    path = str(tmp_path / "resp_src2")
    _write_batch(spark, path, ROWS[:1], mode="overwrite")
    seen: dict[int, dict] = {}

    def on_delays(df, batch_id):
        seen[batch_id] = {r["host"]: r["crawl_delay_ms"] for r in df.collect()}

    stream = spark.readStream.schema(RESPONSE_STREAM_SCHEMA).parquet(path)
    q = stream.writeStream.foreachBatch(
        make_retry_after_batch_processor(on_delays)
    ).start()
    try:
        q.processAllAvailable()
        # first batch: only a redirect row -> no demands
        assert list(seen.values())[-1] == {}
        _write_batch(spark, path, ROWS[2:])  # the 429 arrives
        q.processAllAvailable()
        assert list(seen.values())[-1] == {"s.example": 45_000}
    finally:
        q.stop()
