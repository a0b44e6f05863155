"""Syndication-feed URL intake + HTML feed autodiscovery
(operators/discover.py)."""

from __future__ import annotations

import pytest

from pathik_spark.operators.discover import discover_feed_links, extract_feed_urls


@pytest.fixture(scope="module")
def feeds(spark):
    rss = (
        '<rss version="2.0"><channel>'
        "<link>https://a.example/</link>"
        "<item><link>https://a.example/post1</link></item>"
        "<item><link>  https://a.example/post1  </link></item>"  # padded dup
        '<item><guid isPermaLink="true">https://a.example/post2</guid></item>'
        "<item><guid>tag:a.example,2026:x</guid></item>"  # non-URL guid
        "<item><link>ftp://bad.example/x</link></item>"  # invalid scheme
        "</channel></rss>"
    )
    atom = (
        "<feed>"
        '<link rel="self" href="https://b.example/feed.xml"/>'
        '<entry><link href="https://b.example/atom1" rel="alternate"/>'
        "<id>https://b.example/atom1</id></entry>"
        "</feed>"
    )
    return spark.createDataFrame(
        [("a.example", rss), ("b.example", atom)], "host string, feed_xml string"
    )


def test_extract_feed_urls_rss_and_atom(feeds):
    got = {(r["host"], r["url"]) for r in extract_feed_urls(feeds).collect()}
    assert got == {
        ("a.example", "https://a.example/"),
        ("a.example", "https://a.example/post1"),  # dedup after trim
        ("a.example", "https://a.example/post2"),  # permalink guid
        ("b.example", "https://b.example/feed.xml"),
        ("b.example", "https://b.example/atom1"),
    }


def test_discover_feed_links_both_attribute_orders(spark):
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" href="https://c.example/rss.xml">'
        '<link href="https://c.example/atom.xml" rel="alternate" type="application/atom+xml">'
        '<link rel="stylesheet" href="https://c.example/style.css">'  # not a feed
        "</head><body></body></html>"
    )
    pages = spark.createDataFrame([("c.example", html)], "host string, html string")
    got = {(r["host"], r["feed_url"]) for r in discover_feed_links(pages).collect()}
    assert got == {
        ("c.example", "https://c.example/rss.xml"),
        ("c.example", "https://c.example/atom.xml"),
    }


def test_feed_extraction_case_insensitive(spark):
    """Uppercase tags/attributes (<LINK ... TYPE=...>, <GUID>) are real
    on the web; both the autodiscovery and the feed-body parsers match
    them like meta_robots_directives does ((?i) convention)."""
    page = (
        '<html><head><LINK REL="alternate" TYPE="application/rss+xml" '
        'HREF="https://up.example/feed.xml"></head></html>'
    )
    pages = spark.createDataFrame(
        [("up.example", page)], "host string, html string"
    )
    got = {r["feed_url"] for r in discover_feed_links(pages).collect()}
    assert got == {"https://up.example/feed.xml"}

    feed = (
        "<RSS><CHANNEL><ITEM><LINK>https://up.example/post1</LINK></ITEM>"
        "<ITEM><GUID>https://up.example/post2</GUID></ITEM></CHANNEL></RSS>"
    )
    docs = spark.createDataFrame(
        [("up.example", feed)], "host string, feed_xml string"
    )
    urls = {r["url"] for r in extract_feed_urls(docs, content_col="feed_xml").collect()}
    assert urls == {"https://up.example/post1", "https://up.example/post2"}


def test_decode_sitemap_payloads_gzip_and_plain(spark):
    import gzip

    from pyspark.sql import Row

    from pathik_spark.operators.discover import (
        decode_sitemap_payloads,
        extract_sitemap_urls,
    )

    xml = (
        '<urlset><url><loc>https://h.example/a</loc></url>'
        '<url><loc>https://h.example/b</loc></url></urlset>'
    )
    rows = [
        Row(host="h.example", sitemap_xml=gzip.compress(xml.encode(), mtime=0)),
        Row(host="p.example", sitemap_xml=xml.replace("h.example", "p.example").encode()),
    ]
    df = spark.createDataFrame(rows, "host string, sitemap_xml binary")
    decoded = decode_sitemap_payloads(df)
    assert dict(decoded.dtypes)["sitemap_xml"] == "string"
    got = {
        (r["host"], r["url"]) for r in extract_sitemap_urls(decoded).collect()
    }
    assert got == {
        ("h.example", "https://h.example/a"),
        ("h.example", "https://h.example/b"),
        ("p.example", "https://p.example/a"),
        ("p.example", "https://p.example/b"),
    }
