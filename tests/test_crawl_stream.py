"""Continuous-crawl streaming facade (streaming/crawl_stream.py):
availableNow drain == batch semantics, checkpointed seen state, budget
and robots enforcement across micro-batches."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pathik_spark.streaming.crawl_stream import streaming_crawl

TS = datetime.datetime(2014, 3, 1, 0, 0, 0)


def _pages(spark):
    rows = [
        (f"https://h{i % 3}.example/p{i}", TS, f"<html><body><p>page {i} text</p></body></html>".encode(), "en")
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, lang string")


def _frontier_rows(urls, start_seq=0):
    return [(u, start_seq + i, 0, TS) for i, u in enumerate(urls)]


def _write_frontier(spark, path, urls, start_seq=0):
    spark.createDataFrame(
        _frontier_rows(urls, start_seq),
        "url string, seq long, priority int, event_ts timestamp",
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_drains_and_extracts(spark, tmp_path):
    pages = _pages(spark)
    fdir, odir, cdir = str(tmp_path / "f"), str(tmp_path / "o"), str(tmp_path / "c")
    urls = [f"https://h{i % 3}.example/p{i}" for i in range(6)] + [
        "https://h0.example/missing"
    ]
    _write_frontier(spark, fdir, urls)
    streaming_crawl(spark, fdir, pages, odir, cdir)
    arts = spark.read.parquet(odir)
    got = {r["url"]: r for r in arts.collect()}
    assert len(got) == 7
    assert got["https://h0.example/missing"]["status"] == "missing"
    fetched = [u for u in got if got[u]["status"] == "fetched"]
    assert len(fetched) == 6
    # byte-identical extraction vs the batch kernel on the same page
    from pathik_spark.kernels.extract import extract_text

    for u in fetched:
        i = int(u.rsplit("p", 1)[1])
        assert got[u]["text"] == extract_text(
            f"<html><body><p>page {i} text</p></body></html>".encode()
        )


def test_checkpointed_seen_state_prevents_refetch(spark, tmp_path):
    pages = _pages(spark)
    fdir, odir, cdir = str(tmp_path / "f"), str(tmp_path / "o"), str(tmp_path / "c")
    first = ["https://h0.example/p0", "https://h1.example/p1"]
    _write_frontier(spark, fdir, first)
    streaming_crawl(spark, fdir, pages, odir, cdir)
    n1 = spark.read.parquet(odir).count()
    assert n1 == 2
    # second drop: one dupe + one new URL; same checkpoint
    _write_frontier(spark, fdir, ["https://h0.example/p0", "https://h2.example/p2"], start_seq=10)
    streaming_crawl(spark, fdir, pages, odir, cdir)
    arts = spark.read.parquet(odir)
    assert arts.count() == 3  # dupe NOT refetched
    assert arts.filter(F.col("url") == "https://h0.example/p0").count() == 1


def test_budget_enforced_across_batches(spark, tmp_path):
    pages = _pages(spark)
    fdir, odir, cdir = str(tmp_path / "f"), str(tmp_path / "o"), str(tmp_path / "c")
    _write_frontier(spark, fdir, ["https://h0.example/p0", "https://h0.example/p3"])
    streaming_crawl(spark, fdir, pages, odir, cdir, max_per_host=3)
    _write_frontier(
        spark, fdir, ["https://h0.example/p6", "https://h0.example/p9"], start_seq=10
    )
    streaming_crawl(spark, fdir, pages, odir, cdir, max_per_host=3)
    arts = spark.read.parquet(odir)
    assert arts.count() == 3  # lifetime budget of 3 spans micro-batches


def test_robots_filter_in_stream(spark, tmp_path):
    pages = _pages(spark)
    fdir, odir, cdir = str(tmp_path / "f"), str(tmp_path / "o"), str(tmp_path / "c")
    robots = spark.createDataFrame(
        [("h0.example", ["/p0"])], "host string, disallow_prefixes array<string>"
    )
    _write_frontier(
        spark, fdir, ["https://h0.example/p0", "https://h0.example/p3", "https://h1.example/p1"]
    )
    streaming_crawl(spark, fdir, pages, odir, cdir, robots=robots)
    urls = {r["url"] for r in spark.read.parquet(odir).collect()}
    assert urls == {"https://h0.example/p3", "https://h1.example/p1"}


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch with the same
    batch_id (crash between files landing and checkpoint commit) must
    REPLACE its partition, not append duplicates."""
    from pathik_spark.operators.fetch import pages_by_hash
    from pathik_spark.streaming.crawl_stream import (
        artifact_batch_writer,
        prepare_frontier_stream,
    )

    pages = _pages(spark)
    odir = str(tmp_path / "o")
    batch = prepare_frontier_stream(
        spark.createDataFrame(
            _frontier_rows(["https://h0.example/p0", "https://h1.example/p1"]),
            "url string, seq long, priority int, event_ts timestamp",
        )
    )
    writer = artifact_batch_writer(pages_by_hash(pages), odir, "both")
    writer(batch, 0)
    first = sorted(spark.read.parquet(odir).drop("batch_id").collect())
    writer(batch, 0)  # replayed batch, same batch_id
    assert sorted(spark.read.parquet(odir).drop("batch_id").collect()) == first
    # a NEW batch id lands as an additional partition, nothing replaced
    writer(batch, 1)
    arts = spark.read.parquet(odir)
    assert arts.count() == 2 * len(first)
    assert arts.filter(F.col("batch_id") == 0).count() == len(first)


def test_watermarked_dedup_uses_state_evicting_variant(spark, tmp_path):
    """With a watermark the seen dedup must be dropDuplicatesWithinWatermark
    (state evicted past the delay); plain dropDuplicates keyed on url_hash
    alone never evicts. Asserted on the analyzed streaming plan."""
    from pathik_spark.streaming.crawl_stream import (
        FRONTIER_STREAM_SCHEMA,
        prepare_frontier_stream,
    )

    fdir = str(tmp_path / "f")
    _write_frontier(spark, fdir, ["https://h0.example/p0"])
    stream = spark.readStream.schema(FRONTIER_STREAM_SCHEMA).parquet(fdir)
    with_wm = prepare_frontier_stream(stream, watermark="1 hour")
    plan = with_wm._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan
    no_wm = prepare_frontier_stream(stream)
    plan2 = no_wm._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" not in plan2
