"""HTTP revalidation + cache-directed TTLs (operators/revalidate.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pathik_spark.operators.revalidate import (
    apply_not_modified,
    cache_ttl_hours,
    http_cache_meta,
    revalidation_headers,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _resp(status_line: str, headers: list[str], body: bytes = b"<p>x</p>") -> bytes:
    return (
        "\r\n".join([status_line, *headers]).encode("ascii") + b"\r\n\r\n" + body
    )


ROWS = [
    (  # both validators + max-age; ETag must win for the conditional
        "http://c.example/etag",
        TS,
        _resp(
            "HTTP/1.1 200 OK",
            [
                'ETag: "abc123"',
                "Last-Modified: Thu, 01 Feb 2024 00:00:00 GMT",
                "Date: Fri, 01 Mar 2024 12:00:00 GMT",
                "Cache-Control: public, max-age=7200",
            ],
        ),
    ),
    (  # Last-Modified only -> If-Modified-Since + heuristic TTL
        "http://c.example/lm",
        TS,
        _resp(
            "HTTP/1.1 200 OK",
            [
                "Last-Modified: Tue, 20 Feb 2024 12:00:00 GMT",
                "Date: Fri, 01 Mar 2024 12:00:00 GMT",
            ],
        ),
    ),
    (  # Expires - Date
        "http://c.example/expires",
        TS,
        _resp(
            "HTTP/1.1 200 OK",
            [
                "Date: Fri, 01 Mar 2024 12:00:00 GMT",
                "Expires: Sat, 02 Mar 2024 12:00:00 GMT",
            ],
        ),
    ),
    (  # no-store wins over everything
        "http://c.example/nostore",
        TS,
        _resp(
            "HTTP/1.1 200 OK",
            ["Cache-Control: no-store, max-age=999999"],
        ),
    ),
    (  # extension token must NOT trigger no_store; garbage date is data
        "http://c.example/ext",
        TS,
        _resp(
            "HTTP/1.1 200 OK",
            ["Cache-Control: no-cache-xyz", "Expires: not-a-date"],
        ),
    ),
    ("http://c.example/bare", TS, _resp("HTTP/1.1 200 OK", [])),
]


def _meta(spark):
    df = spark.createDataFrame(
        ROWS, "url string, warc_ts timestamp, html binary"
    )
    return http_cache_meta(df)


def test_http_cache_meta(spark):
    out = {r["url"]: r.asDict() for r in _meta(spark).collect()}
    e = out["http://c.example/etag"]
    assert e["etag"] == '"abc123"'
    assert e["max_age_s"] == 7200
    assert e["last_modified"] == dt.datetime(2024, 2, 1)
    assert e["date"] == dt.datetime(2024, 3, 1, 12)
    assert not e["no_store"]
    assert out["http://c.example/nostore"]["no_store"]
    x = out["http://c.example/ext"]
    assert not x["no_store"]  # 'no-cache-xyz' is a different token
    assert x["expires"] is None  # malformed date parses to NULL, not error
    b = out["http://c.example/bare"]
    assert b["etag"] is None and b["max_age_s"] is None


def test_revalidation_headers_etag_wins(spark):
    out = {
        r["url"]: (r["if_none_match"], r["if_modified_since"])
        for r in revalidation_headers(_meta(spark)).collect()
    }
    assert out["http://c.example/etag"] == ('"abc123"', None)
    assert out["http://c.example/lm"] == (
        None,
        "Tue, 20 Feb 2024 12:00:00 GMT",  # round-trips the IMF-fixdate
    )
    assert out["http://c.example/bare"] == (None, None)


def test_cache_ttl_precedence(spark):
    out = {
        r["url"]: (r["ttl_hours"], r["ttl_source"])
        for r in cache_ttl_hours(_meta(spark), default_ttl_hours=168).collect()
    }
    assert out["http://c.example/etag"] == (2.0, "max_age")  # 7200 s
    # heuristic: 10% of (Mar 1 - Feb 20) = 10% of 240 h = 24 h
    assert out["http://c.example/lm"] == (24.0, "heuristic")
    assert out["http://c.example/expires"] == (24.0, "expires")
    assert out["http://c.example/nostore"] == (1.0, "no_store")
    assert out["http://c.example/ext"] == (168.0, "default")
    assert out["http://c.example/bare"] == (168.0, "default")


def test_cache_ttl_clamps(spark):
    rows = [
        ("http://c.example/tiny", TS, _resp("HTTP/1.1 200 OK", ["Cache-Control: max-age=1"])),
        ("http://c.example/huge", TS, _resp("HTTP/1.1 200 OK", ["Cache-Control: max-age=999999999"])),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = {
        r["url"]: r["ttl_hours"]
        for r in cache_ttl_hours(http_cache_meta(df)).collect()
    }
    assert out["http://c.example/tiny"] == 1.0  # floored at min_ttl_hours
    assert out["http://c.example/huge"] == 720.0  # capped at max_ttl_hours


def test_apply_not_modified(spark):
    fetches = spark.createDataFrame(
        [
            ("http://c.example/same", 304, None),
            ("http://c.example/new", 200, b"<p>fresh</p>"),
        ],
        "url string, status_code int, html binary",
    )
    prev = spark.createDataFrame(
        [("http://c.example/same", b"<p>old body</p>")], "url string, html binary"
    )
    out = {
        r["url"]: (bytes(r["html"]) if r["html"] is not None else None, r["status"])
        for r in apply_not_modified(fetches, prev).collect()
    }
    assert out["http://c.example/same"] == (b"<p>old body</p>", "revalidated")
    assert out["http://c.example/new"] == (b"<p>fresh</p>", "fetched")


def test_retry_after_delays(spark):
    from pathik_spark.operators.revalidate import retry_after_delays

    rows = [
        # delta-seconds form; MAX of the two per-host values wins
        ("http://r.example/a", TS, _resp("HTTP/1.1 429 Too Many Requests", ["Retry-After: 120"])),
        ("http://r.example/b", TS, _resp("HTTP/1.1 503 Service Unavailable", ["Retry-After: 300"])),
        # HTTP-date form measured against the response Date
        (
            "http://d.example/a",
            TS,
            _resp(
                "HTTP/1.1 503 Service Unavailable",
                [
                    "Date: Fri, 01 Mar 2024 12:00:00 GMT",
                    "Retry-After: Fri, 01 Mar 2024 12:01:30 GMT",
                ],
            ),
        ),
        # date in the past clamps to 0, not negative
        (
            "http://p.example/a",
            TS,
            _resp(
                "HTTP/1.1 429 Too Many Requests",
                [
                    "Date: Fri, 01 Mar 2024 12:00:00 GMT",
                    "Retry-After: Fri, 01 Mar 2024 11:00:00 GMT",
                ],
            ),
        ),
        # a 200 with Retry-After is not a backoff demand
        ("http://ok.example/a", TS, _resp("HTTP/1.1 200 OK", ["Retry-After: 999"])),
        # cap applies
        ("http://c.example/a", TS, _resp("HTTP/1.1 429 Too Many Requests", ["Retry-After: 99999999"])),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = {r["host"]: r["crawl_delay_ms"] for r in retry_after_delays(df).collect()}
    assert out == {
        "r.example": 300_000,
        "d.example": 90_000,
        "p.example": 0,
        "c.example": 3_600_000,
    }


def test_retry_after_feeds_delay_overlay(spark):
    from pathik_spark.operators.revalidate import retry_after_delays
    from pathik_spark.operators.robots import apply_delay_overrides

    records = spark.createDataFrame(
        [("http://r.example/a", TS, _resp("HTTP/1.1 429 Too Many Requests", ["Retry-After: 60"]))],
        "url string, warc_ts timestamp, html binary",
    )
    robots = spark.createDataFrame(
        [("r.example", 120_000), ("other.example", 5_000)],
        "host string, crawl_delay_ms long",
    )
    out = {
        r["host"]: r["crawl_delay_ms"]
        for r in apply_delay_overrides(robots, retry_after_delays(records)).collect()
    }
    # robots Crawl-delay stays the floor: MAX(120s, 60s) = 120s
    assert out == {"r.example": 120_000, "other.example": 5_000}


def test_parsers_total_over_garbage(spark):
    """The header parsers must be TOTAL over adversarial payloads —
    garbage bytes, truncated/huge headers, malformed dates and numbers
    parse to NULLs, never task failures."""
    import random

    from pathik_spark.operators.redirects import http_response_meta
    from pathik_spark.operators.revalidate import retry_after_delays

    rng = random.Random(42)
    rows = [
        ("http://g.example/rand", TS, bytes(rng.randrange(256) for _ in range(4096))),
        ("http://g.example/empty", TS, b""),
        ("http://g.example/null", TS, None),
        ("http://g.example/truncated", TS, b"HTTP/1.1 30"),
        ("http://g.example/no-crlfcrlf", TS, b"HTTP/1.1 200 OK\r\nETag: x"),
        ("http://g.example/huge-header", TS, b"HTTP/1.1 200 OK\r\nX: " + b"A" * 100_000),
        (
            "http://g.example/bad-values",
            TS,
            _resp(
                "HTTP/1.1 301 Moved",
                [
                    "Retry-After: soonish",
                    "Cache-Control: max-age=eleventy",
                    "Last-Modified: yesterday",
                    "Expires: " + "9" * 50,
                    "Location: ",
                ],
            ),
        ),
        ("http://g.example/status-junk", TS, b"HTTP/9.99 99999 ???\r\n\r\n"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    meta = {r["url"]: r.asDict() for r in http_cache_meta(df).collect()}
    assert len(meta) == len(rows)
    bad = meta["http://g.example/bad-values"]
    assert bad["status_code"] == 301
    assert bad["max_age_s"] is None and bad["last_modified"] is None
    assert bad["expires"] is None
    assert meta["http://g.example/status-junk"]["status_code"] is None
    rmeta = {r["url"]: r["status_code"] for r in http_response_meta(df).collect()}
    assert rmeta["http://g.example/truncated"] is None
    # 'Retry-After: soonish' parses to NULL in both forms -> no row
    assert retry_after_delays(df).collect() == []
    assert cache_ttl_hours(http_cache_meta(df)).count() == len(rows)


def test_meta_plan_is_scan_local(spark):
    df = spark.createDataFrame(ROWS, "url string, warc_ts timestamp, html binary")
    plan = (
        http_cache_meta(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
