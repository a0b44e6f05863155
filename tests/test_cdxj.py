"""CDXJ index interchange (sources/cdxj) + SURT keys (functions/urls)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from pathik_spark.functions.urls import surt_key_expr
from pathik_spark.sources.cdxj import (
    cdxj_lines,
    parse_cdxj_lines,
    read_cdxj,
    write_cdxj,
)


def test_surt_key_cases(spark):
    cases = {
        "https://WWW.Example.COM:443/a/B?z=1&a=2#f":
            "com,example,www)/a/b?a=2&z=1",
        "http://example.com": "com,example)/",
        "http://user:pw@example.com:8080/x": "com,example:8080)/x",
        "https://sub.host.example/p/q?one": "example,host,sub)/p/q?one",
    }
    df = spark.createDataFrame(
        [Row(url=u) for u in cases], "url string"
    ).select("url", surt_key_expr(F.col("url")).alias("surt"))
    got = {r["url"]: r["surt"] for r in df.collect()}
    assert got == cases


def _index(spark, n=40):
    rows = [
        Row(
            url=f"https://s{i % 7}.example/p/{i}",
            warc_ts=datetime.datetime(2024, 3, 1 + i % 20, 12, i % 60, 0),
            path=f"crawl/part-{i % 3}.warc",
            offset=i * 1021,
            length=300 + i,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, path string, offset long, length long",
    )


def test_roundtrip_and_global_order(spark, tmp_path):
    idx = _index(spark)
    lines = cdxj_lines(idx)
    summary = write_cdxj(lines, str(tmp_path / "cdx"), n_shards=3).collect()
    back = read_cdxj(spark, str(tmp_path / "cdx"))
    got = sorted(
        (r["url"], r["ts"], r["filename"], r["offset"], r["length"])
        for r in back.collect()
    )
    want = sorted(
        (r["url"], r["warc_ts"], r["path"], r["offset"], r["length"])
        for r in idx.collect()
    )
    assert got == want
    # absent fields parse as NULL on the plain reader
    assert back.filter(F.col("mime").isNotNull()).count() == 0
    # shard key ranges are disjoint and ordered (the cluster.idx role)
    spans = sorted((s["first_key"], s["last_key"]) for s in summary)
    assert sum(s["n_lines"] for s in summary) == 40
    for (_, last), (first, _) in zip(spans, spans[1:]):
        assert last <= first


def test_optional_fields_roundtrip(spark, tmp_path):
    idx = _index(spark, n=6).select(
        "*",
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.lit("SHA1XYZ").alias("digest"),
    )
    lines = cdxj_lines(
        idx, mime_col="mime", status_col="status", digest_col="digest"
    )
    back = parse_cdxj_lines(lines)
    row = back.collect()[0]
    assert (row["mime"], row["status"], row["digest"]) == (
        "text/html", 200, "SHA1XYZ",
    )
