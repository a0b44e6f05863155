"""rel=canonical extraction + alias-group collapse (operators/aliases)."""

from __future__ import annotations

from pyspark.sql import Row

from pathik_spark.operators.aliases import (
    canonical_collapse,
    extract_canonical_links,
)


def _links(spark, pages: list[tuple[str, str]]) -> dict[str, str]:
    df = spark.createDataFrame(
        [Row(url=u, html=h) for u, h in pages], "url string, html string"
    )
    return {
        r["url"]: r["canonical_url"]
        for r in extract_canonical_links(df).collect()
    }


def test_extraction_variants(spark):
    got = _links(
        spark,
        [
            # absolute target
            ("https://a.example/dir/p1",
             '<head><link rel="canonical" href="https://c.example/x"></head>'),
            # root-relative resolves against the origin
            ("https://a.example/dir/p2",
             '<head><link rel="canonical" href="/canon"></head>'),
            # href-before-rel attribute order
            ("https://a.example/dir/p3",
             '<head><link href="sib" rel="canonical"></head>'),
            # uppercase tag / attr names / value
            ("https://a.example/dir/p4",
             '<head><LINK REL="CANONICAL" HREF="//cdn.example/y"></head>'),
            # no declaration
            ("https://a.example/dir/p5", "<head></head>"),
            # empty href
            ("https://a.example/dir/p6",
             '<head><link rel="canonical" href=""></head>'),
            # first tag wins
            ("https://a.example/dir/p7",
             '<head><link rel="canonical" href="/first">'
             '<link rel="canonical" href="/second"></head>'),
            # fragment dropped, dot segments popped
            ("https://a.example/dir/p8",
             '<head><link rel="canonical" href="../up/./x#f"></head>'),
            # non-http target dropped as invalid
            ("https://a.example/dir/p9",
             '<head><link rel="canonical" href="mailto:a@b"></head>'),
            # a stylesheet link is not a canonical declaration
            ("https://a.example/dir/p10",
             '<head><link rel="stylesheet" href="/s.css"></head>'),
        ],
    )
    assert got["https://a.example/dir/p1"] == "https://c.example/x"
    assert got["https://a.example/dir/p2"] == "https://a.example/canon"
    assert got["https://a.example/dir/p3"] == "https://a.example/dir/sib"
    assert got["https://a.example/dir/p4"] == "https://cdn.example/y"
    assert got["https://a.example/dir/p5"] == ""
    assert got["https://a.example/dir/p6"] == ""
    assert got["https://a.example/dir/p7"] == "https://a.example/first"
    assert got["https://a.example/dir/p8"] == "https://a.example/up/x"
    assert got["https://a.example/dir/p9"] == ""
    assert got["https://a.example/dir/p10"] == ""


def test_collapse_prefers_canonical_page_then_min_alias(spark):
    links = spark.createDataFrame(
        [
            # group whose target WAS crawled: representative = target
            Row(url="https://h/print", canonical_url="https://h/a"),
            Row(url="https://h/amp", canonical_url="https://h/a"),
            Row(url="https://h/a", canonical_url=""),
            # group whose target was NOT crawled: min alias wins
            Row(url="https://h/z2", canonical_url="https://h/gone"),
            Row(url="https://h/z1", canonical_url="https://h/gone"),
            # self-canonical singleton
            Row(url="https://h/s", canonical_url="https://h/s"),
        ],
        "url string, canonical_url string",
    )
    got = {
        r["canonical_url"]: (r["n_aliases"], r["representative_url"])
        for r in canonical_collapse(links).collect()
    }
    assert got == {
        "https://h/a": (3, "https://h/a"),
        "https://h/gone": (2, "https://h/z1"),
        "https://h/s": (1, "https://h/s"),
    }


def test_canonical_channel_in_discover_seeds(spark):
    from pyspark.sql import Row

    from pathik_spark.operators.discover import discover_seeds

    links = spark.createDataFrame(
        [
            Row(url="https://h/print", canonical_url="https://h/a"),
            Row(url="https://h/self", canonical_url="https://h/self"),
            Row(url="https://h/none", canonical_url=""),
        ],
        "url string, canonical_url string",
    )
    got = {r["url"]: r["priority"] for r in discover_seeds(canonical_links=links).collect()}
    assert got == {"https://h/a": 1}


def test_collapse_plan_single_shuffle_partial_agg(spark):
    """canonical_collapse: exactly one Exchange (the group on the
    canonical key), with a partial aggregate below it."""
    links = spark.createDataFrame(
        [("https://h/a", ""), ("https://h/b", "https://h/a")],
        "url string, canonical_url string",
    )
    plan = (
        canonical_collapse(links)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan or "HashAggregate" in plan
