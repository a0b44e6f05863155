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
