"""One-call HTTP-layer analysis facade (api.analyze_http_responses)."""

from __future__ import annotations

import datetime as dt

from pathik_spark.api import analyze_http_responses

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _resp(status_line: str, headers: list[str], body: bytes = b"") -> bytes:
    return (
        "\r\n".join([status_line, *headers]).encode("ascii") + b"\r\n\r\n" + body
    )


def test_facade_four_views_one_input(spark):
    rows = [
        (
            "http://f.example/start",
            TS,
            _resp("HTTP/1.1 301 Moved", ["Location: /end"]),
        ),
        (
            "http://f.example/end",
            TS,
            _resp(
                "HTTP/1.1 200 OK",
                ["Cache-Control: max-age=3600", 'ETag: "e1"'],
                b"<p>hi</p>",
            ),
        ),
        (
            "http://f.example/busy",
            TS,
            _resp("HTTP/1.1 429 Too Many Requests", ["Retry-After: 30"]),
        ),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    meta, chains, ttls, delays = analyze_http_responses(df)

    m = {r["url"]: r["status_code"] for r in meta.collect()}
    assert m == {
        "http://f.example/start": 301,
        "http://f.example/end": 200,
        "http://f.example/busy": 429,
    }
    c = {r["url"]: (r["final_url"], r["terminal"]) for r in chains.collect()}
    assert c["http://f.example/start"] == ("http://f.example/end", "final")
    t = {r["url"]: (r["ttl_hours"], r["ttl_source"]) for r in ttls.collect()}
    assert t["http://f.example/end"] == (1.0, "max_age")
    d = {r["host"]: r["crawl_delay_ms"] for r in delays.collect()}
    assert d == {"f.example": 30_000}
