"""URL kernel parity: native Spark expressions == normative Python kernel
(SURVEY.md §2.3 X1-X4, §2.2 F1, §2.9 B1) on every fixture URL, including
the uncanonical / invalid seed strata."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.functions import urls as U
from pathik_spark.kernels import canonical as K

EDGE_URLS = [
    "https://host0.example/sec0/page0",
    "HTTP://Host1.Example:80/a/../b/?utm_source=x&b=2&a=1#f",
    "https://host1.example:443/sec1/page1#frag2",
    "https://example.com:8080/path/to%20sp?q=1",
    "https://example.com/",
    "https://example.com",
    "https://192.168.1.5/x",
    "https://10.0.0.8/x",
    "https://172.16.0.1/x",
    "https://172.32.0.1/x",  # NOT private (172.32 outside 172.16/12)
    "https://localhost/x",
    "https://127.0.0.1/x",
    "ftp://host.example/x",
    "https://10.foo.example/x",  # host starts like an IP but is not one
    "https://host.example./trailing-dot",
    "https://host.example/a/b/c/",
    "https://host.example/%41%2e%2e",
]


def _all_urls(corpus_pd):
    return sorted(set(corpus_pd["seeds"]["url"]) | set(corpus_pd["pages"]["url"]) | set(EDGE_URLS))


def test_domain_name_expr_matches_kernel(spark, corpus_pd):
    urls = _all_urls(corpus_pd)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select("url", U.domain_name_expr(F.col("url")).alias("d")).collect()
    }
    for u in urls:
        assert got[u] == K.domain_name_for_file(u), u


def test_sanitize_expr_matches_kernel(spark, corpus_pd):
    urls = _all_urls(corpus_pd)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select("url", U.sanitize_url_expr(F.col("url")).alias("s")).collect()
    }
    for u in urls:
        assert got[u] == K.sanitize_url(u), u


def test_validation_expr_matches_kernel(spark, corpus_pd):
    urls = _all_urls(corpus_pd)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["v"]
        for r in df.select("url", U.is_valid_url_expr(F.col("url")).alias("v")).collect()
    }
    for u in urls:
        assert got[u] == K.validate_url(u), u


def test_canonicalize_udf_matches_kernel(spark, corpus_pd):
    urls = _all_urls(corpus_pd)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", U.canonicalize_udf(F.col("url")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == K.canonicalize_url(u), u


def test_canonicalize_collapses_variants():
    base = "https://host3.example/sec1/page1"
    variants = [
        "HTTP://host3.example/sec1/page1",  # different scheme stays different
        "https://HOST3.example:443/sec1/page1",
        "https://host3.example/sec1/page1#frag",
        "https://host3.example/x/../sec1/page1",
        "https://host3.example/sec1/page1?utm_source=x&utm_medium=y",
    ]
    assert K.canonicalize_url(variants[0]) == base.replace("https://", "http://")
    for v in variants[1:]:
        assert K.canonicalize_url(v) == base, v


def test_filename_and_r2_key(spark):
    df = spark.createDataFrame(
        [("https://example.com/path/to/page", "2025-03-05 00:00:00", "u-1")],
        "url string, warc_ts string, uuid string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    row = df.select(
        U.filename_expr(F.col("url"), F.col("warc_ts"), "html").alias("fh"),
        U.filename_expr(F.col("url"), F.col("warc_ts"), "md").alias("fm"),
        U.filename_expr(F.col("url"), F.col("warc_ts"), "weird").alias("ft"),
        U.r2_key_expr(F.col("uuid"), F.col("url"), "html").alias("rk"),
    ).collect()[0]
    assert row["fh"] == "example_com_path_to_page_2025-03-05.html"
    assert row["fm"] == "example_com_path_to_page_2025-03-05.md"
    assert row["ft"] == "example_com_path_to_page_2025-03-05.txt"
    assert row["rk"] == "u-1+example.com_path_to_page.html"
    assert row["fh"] == K.filename_for("https://example.com/path/to/page", "2025-03-05", "html")
    assert row["rk"] == K.r2_key("u-1", "https://example.com/path/to/page", "html")


def test_hashes_are_stable_and_sharded(spark, corpus):
    seeds = corpus["seeds"]
    out = seeds.select(
        U.url_hash_expr(F.col("url")).alias("h"),
        U.host_hash_expr(U.hostname_of(F.col("url")), 64).alias("hh"),
    )
    rows = out.collect()
    assert all(0 <= r["hh"] < 64 for r in rows)
    rows2 = out.collect()
    assert [r["h"] for r in rows] == [r["h"] for r in rows2]


def test_user_agent_deterministic(spark):
    df = spark.createDataFrame([("https://a.example/1",), ("https://b.example/2",)], "url string")
    out1 = [r["ua"] for r in df.select(U.user_agent_expr(F.col("url")).alias("ua")).collect()]
    out2 = [r["ua"] for r in df.select(U.user_agent_expr(F.col("url")).alias("ua")).collect()]
    assert out1 == out2
    assert all(ua in U.USER_AGENTS for ua in out1)


def test_canonical_col_routing_matches_kernel(spark):
    """The routed fast-path/UDF canonicalization must equal the kernel on
    every stratum: simple URLs (expression path), dot-segments, userinfo,
    odd ports, trailing-dot hosts, whitespace, non-http (UDF path)."""
    from pathik_spark.kernels.canonical import canonicalize_url

    urls = [
        "https://host1.example/a/b?b=2&a=1&utm_source=x#f",
        "HTTPS://Host2.Example:443/x",
        "http://host3.example:8080/p?gclid=1&z=9",
        "https://host4.example",
        "https://host5.example/a/../b/./c",        # dot segments -> kernel
        "https://user:pw@host6.example/p",          # userinfo -> kernel
        "https://host7.example.:80/p",              # trailing dot -> kernel
        "https://host8.example:080/p",              # leading-zero port -> kernel
        "  https://host9.example/sp aced  ",        # inner space -> kernel
        "ftp://host10.example/x",                   # non-http -> kernel
        "https://host11.example/?",                 # empty query
        "https://host12.example/p?x=1&x=1&",        # dup + empty pairs
        "https://HOST13.example/P/Q?fbclid=9",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from pathik_spark.functions.urls import canonical_col

    got = {r["url"]: r["c"] for r in df.select("url", canonical_col(F.col("url")).alias("c")).collect()}
    for u in urls:
        assert got[u] == canonicalize_url(u), (u, got[u], canonicalize_url(u))


def test_canonical_col_fast_path_has_no_udf_for_simple(spark):
    """A frontier of all-simple URLs still plans one ArrowEvalPython node
    (the masked UDF) but sends it only NULLs — verified by equality above;
    here we check the expression path actually exists in the plan."""
    df = spark.createDataFrame([("https://h.example/p",)], "url string")
    from pathik_spark.functions.urls import canonical_col

    plan = df.select(canonical_col(F.col("url")).alias("c"))._jdf.queryExecution().optimizedPlan().toString()
    assert "sort_array" in plan  # the expression branch is present


def test_canonicalize_idn_host_punycode():
    from pathik_spark.kernels.canonical import canonicalize_url

    # unicode host and its punycode wire form share one canonical id
    assert canonicalize_url("https://münchen.example/") == canonicalize_url(
        "https://xn--mnchen-3ya.example/"
    )
    assert (
        canonicalize_url("https://BÜCHER.de:443/x")
        == "https://xn--bcher-kva.de/x"
    )
    # ascii hosts untouched; garbage hosts stay total
    assert canonicalize_url("https://ascii.example/p") == "https://ascii.example/p"
    assert canonicalize_url("https://é\ud800bad../") is not None
