"""Tests for anchor-text aggregation (operators/anchors.py) and crawl
snapshot diffing (operators/delta.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.kernels.extract import extract_anchors
from pathik_spark.operators.anchors import anchor_text_profile, page_anchors
from pathik_spark.operators.delta import crawl_delta, delta_stats

HTML = (
    b'<html><body><nav><a href="/chrome">chrome</a></nav>'
    b'<p><a href="#top">skip</a>'
    b'<a href="/a">First <b>Link</b></a>'
    b'<a href="rel/b">  spaced   text </a>'
    b'<a href="mailto:x@y.z">mail</a>'
    b'<a href="https://ext.example/c"><img src="i.png"/></a></p></body></html>'
)


def test_extract_anchors_kernel():
    pairs = extract_anchors(HTML, "https://h.example/dir/page")
    assert pairs == [
        ("https://h.example/a", "First Link"),
        ("https://h.example/dir/rel/b", "spaced text"),
        ("https://ext.example/c", ""),  # image anchor: empty text
    ]


def test_extract_anchors_empty_and_none():
    assert extract_anchors(None, "https://x.example/") == []
    assert extract_anchors(b"", "https://x.example/") == []


def test_extract_anchors_nested_anchor_not_double_collected():
    """Malformed crawl HTML nests anchors; the outer anchor's text
    already spans its subtree, so the inner anchor must not be
    collected again (ADVICE round-2 fix)."""
    html = (
        b'<html><body><a href="/outer">out <a href="/inner">in</a></a>'
        b'<span><a href="/plain">ok</a></span></body></html>'
    )
    pairs = extract_anchors(html, "https://h.example/")
    hrefs = [h for h, _ in pairs]
    assert hrefs == ["https://h.example/outer", "https://h.example/plain"]
    # the outer anchor's text still includes the nested subtree's text
    assert pairs[0][1] == "out in"


def test_page_anchors_explode(spark):
    pages = spark.createDataFrame(
        [("https://h.example/dir/page", bytearray(HTML))], "url string, html binary"
    )
    rows = sorted(
        (r["pos"], r["dst_url"], r["anchor"]) for r in page_anchors(pages).collect()
    )
    assert rows == [
        (0, "https://h.example/a", "First Link"),
        (1, "https://h.example/dir/rel/b", "spaced text"),
        (2, "https://ext.example/c", ""),
    ]


def test_anchor_text_profile(spark):
    anchors = spark.createDataFrame(
        [
            ("https://s1.example/p", 0, "https://t.example/x", "Zebra"),
            ("https://s1.example/q", 0, "https://t.example/x", "apple"),
            ("https://s2.example/r", 0, "https://t.example/x", "apple"),
            ("https://s2.example/r", 1, "https://t.example/x", ""),
            ("https://s1.example/p", 1, "https://t.example/y", "only"),
        ],
        "src_url string, pos int, dst_url string, anchor string",
    )
    got = {r["dst_url"]: r.asDict() for r in anchor_text_profile(anchors).collect()}
    x = got["https://t.example/x"]
    assert x["n_inlinks"] == 4
    assert x["n_src_hosts"] == 2
    assert x["anchors"] == "Zebra|apple"  # distinct, sorted, empties dropped
    assert got["https://t.example/y"]["anchors"] == "only"


def test_anchor_profile_cap(spark):
    anchors = spark.createDataFrame(
        [("s", 0, "d", f"a{i:02d}") for i in range(30)],
        "src_url string, pos int, dst_url string, anchor string",
    )
    got = anchor_text_profile(anchors, max_anchors=5).collect()[0]
    assert got["anchors"] == "a00|a01|a02|a03|a04"


# --- crawl delta -------------------------------------------------------------


def test_crawl_delta_verdicts(spark):
    prev = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, content_hash string"
    )
    cur = spark.createDataFrame(
        [("u2", "h2"), ("u3", "h3x"), ("u4", "h4")], "url string, content_hash string"
    )
    got = {r["url"]: r["change"] for r in crawl_delta(prev, cur).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "modified",
        "u4": "added",
    }


def test_delta_stats_churn(spark):
    prev = spark.createDataFrame(
        [(f"https://a.example/{i}", f"h{i}") for i in range(4)]
        + [("https://b.example/0", "x")],
        "url string, content_hash string",
    )
    cur = spark.createDataFrame(
        [(f"https://a.example/{i}", f"h{i}") for i in range(3)]  # 3 unchanged, 1 removed
        + [("https://b.example/0", "y")],  # modified
        "url string, content_hash string",
    )
    stats = {r["host"]: r.asDict() for r in delta_stats(crawl_delta(prev, cur)).collect()}
    a = stats["a.example"]
    assert (a["n_unchanged"], a["n_removed"], a["n_added"], a["n_modified"]) == (3, 1, 0, 0)
    assert abs(a["churn"] - 0.25) < 1e-9
    assert stats["b.example"]["churn"] == 1.0


def test_recrawl_ttl_hours_law(spark):
    from pathik_spark.operators.delta import recrawl_ttl_hours

    stats = spark.createDataFrame(
        [("stable.example", 0.0), ("churny.example", 1.0), ("mid.example", 0.5), ("nodata.example", None)],
        "host string, churn double",
    )
    got = {r["host"]: r["ttl_hours"] for r in recrawl_ttl_hours(stats, 24.0, 720.0).collect()}
    assert got["stable.example"] == 720.0
    assert got["churny.example"] == 24.0
    assert abs(got["mid.example"] - 372.0) < 1e-9
    assert got["nodata.example"] == 720.0  # unknown host -> assume stable
    import pytest as _pytest

    with _pytest.raises(ValueError):
        recrawl_ttl_hours(stats, 0.0, 720.0)


def test_recrawl_filter_adaptive(spark):
    import datetime

    from pathik_spark.functions.urls import url_hash_expr
    from pathik_spark.operators.delta import recrawl_filter_adaptive

    now = datetime.datetime(2014, 3, 10, 0, 0, 0)
    old = datetime.datetime(2014, 3, 1, 0, 0, 0)   # 9 days old
    new = datetime.datetime(2014, 3, 9, 12, 0, 0)  # 12 h old
    urls = {
        "a": "https://churny.example/a",   # seen 9d ago, ttl 24h -> STALE, readmit
        "b": "https://churny.example/b",   # seen 12h ago, ttl 24h -> fresh, block
        "c": "https://stable.example/c",   # seen 9d ago, ttl 720h -> fresh, block
        "d": "https://unknown.example/d",  # seen 9d ago, no ttl -> block (never expires)
        "e": "https://churny.example/e",   # never seen -> pass
    }
    frontier = spark.createDataFrame(
        [(u,) for u in urls.values()], "url string"
    ).withColumn("url_hash", url_hash_expr(F.col("url")))
    seen = spark.createDataFrame(
        [
            (urls["a"], old),
            (urls["b"], new),
            (urls["c"], old),
            (urls["d"], old),
        ],
        "url string, seen_ts timestamp",
    ).withColumn("url_hash", url_hash_expr(F.col("url")))
    ttls = spark.createDataFrame(
        [("churny.example", 24.0), ("stable.example", 720.0)],
        "host string, ttl_hours double",
    )
    out = {
        r["url"]
        for r in recrawl_filter_adaptive(frontier, seen, ttls, now).collect()
    }
    assert out == {urls["a"], urls["e"]}


def test_recrawl_filter_adaptive_url_ttl_overlay(spark):
    """Per-URL server-declared TTLs (cache_ttl_hours shape) override the
    host churn TTL where present; rows without one fall back."""
    import datetime

    from pathik_spark.functions.urls import url_hash_expr
    from pathik_spark.operators.delta import recrawl_filter_adaptive

    now = datetime.datetime(2014, 3, 10, 0, 0, 0)
    old = datetime.datetime(2014, 3, 1, 0, 0, 0)  # 9 days = 216 h old
    urls = {
        # host ttl 720h would block; url ttl 24h expires it -> readmit
        "short": "https://stable.example/volatile",
        # host ttl 24h would readmit; url ttl 8760h keeps it fresh -> block
        "long": "https://churny.example/immutable",
        # no url ttl -> host churn ttl 24h -> stale -> readmit
        "fallback": "https://churny.example/plain",
    }
    frontier = spark.createDataFrame(
        [(u,) for u in urls.values()], "url string"
    ).withColumn("url_hash", url_hash_expr(F.col("url")))
    seen = spark.createDataFrame(
        [(u, old) for u in urls.values()], "url string, seen_ts timestamp"
    ).withColumn("url_hash", url_hash_expr(F.col("url")))
    ttls = spark.createDataFrame(
        [("churny.example", 24.0), ("stable.example", 720.0)],
        "host string, ttl_hours double",
    )
    url_ttls = spark.createDataFrame(
        [(urls["short"], 24.0), (urls["long"], 8760.0)],
        "url string, ttl_hours double",
    )
    out = {
        r["url"]
        for r in recrawl_filter_adaptive(
            frontier, seen, ttls, now, url_ttls=url_ttls
        ).collect()
    }
    assert out == {urls["short"], urls["fallback"]}
