"""Article publication dating (operators/dating)."""

from __future__ import annotations

from pyspark.sql import Row

from pathik_spark.operators.dating import article_dates


def _run(spark, pages):
    df = spark.createDataFrame(
        [Row(url=u, html=h) for u, h in pages], "url string, html string"
    )
    return {
        r["url"]: (r["date_published"], r["date_source"])
        for r in article_dates(df).collect()
    }


def test_channels_and_precedence(spark):
    got = _run(
        spark,
        [
            ("u1", '<script type="application/ld+json">'
                   '{"@type": "NewsArticle", "datePublished": "2024-02-29T08:00:00Z"}'
                   "</script>"),
            ("u2", '<meta property="article:published_time" content="2023-06-15T10:00:00Z">'),
            ("u3", '<time datetime="2022-12-01">then</time>'),
            # jsonld wins over og
            ("u4", '<script type="application/ld+json">{"datePublished": "2019-07-07"}</script>'
                   '<meta property="article:published_time" content="2018-01-01">'),
            # jsonld present but dateless: og fallback
            ("u5", '<script type="application/ld+json">{"@type": "Article"}</script>'
                   '<meta property="article:published_time" content="2021-03-03">'),
            # malformed jsonld: falls through to <time>, no exception
            ("u6", '<script type="application/ld+json">{broken</script>'
                   '<time datetime="2020-05-05T00:00:00">t</time>'),
            # reversed OG attribute order + uppercase
            ("u7", '<META CONTENT="2017-09-30" PROPERTY="article:published_time">'),
            # impossible calendar date: data, not a crash; no fallback left
            ("u8", '<meta property="article:published_time" content="2017-09-31">'),
            ("u9", "<body>undated</body>"),
        ],
    )
    assert got["u1"] == ("2024-02-29", "jsonld")
    assert got["u2"] == ("2023-06-15", "og")
    assert got["u3"] == ("2022-12-01", "time")
    assert got["u4"] == ("2019-07-07", "jsonld")
    assert got["u5"] == ("2021-03-03", "og")
    assert got["u6"] == ("2020-05-05", "time")
    assert got["u7"] == ("2017-09-30", "og")
    assert got["u8"] == ("", "")
    assert got["u9"] == ("", "")
