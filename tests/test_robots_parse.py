"""Relational robots.txt parser (operators/robots.parse_robots_txt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.operators.robots import (
    attach_robots,
    filter_disallowed,
    parse_robots_txt,
)

EXACT_AND_STAR = """# comment line
User-agent: *
Disallow: /private
Crawl-delay: 1

User-agent: pathik
User-agent: otherbot
Disallow: /api
Disallow: /tmp
Allow: /api/public
Crawl-delay: 0.5"""

STAR_ONLY_MIXED_CASE = """User-Agent: GoogleBot
Disallow: /g
User-agent: *
disallow: /private
CRAWL-DELAY: 2"""

NO_DIRECTIVES = "just some garbage\nno directives here"

FOREIGN_ONLY = "User-agent: GoogleBot\nDisallow: /g"


def _parse(spark, rows, ua="pathik"):
    df = spark.createDataFrame(rows, ["host", "robots_txt"])
    return {r["host"]: r for r in parse_robots_txt(df, ua).collect()}


def test_exact_group_beats_star(spark):
    out = _parse(spark, [("h1", EXACT_AND_STAR)])
    r = out["h1"]
    assert r["crawl_delay_ms"] == 500
    assert r["disallow_prefixes"] == ["/api", "/tmp"]
    assert r["allow_prefixes"] == ["/api/public"]


def test_star_fallback_and_case_insensitive_fields(spark):
    out = _parse(spark, [("h2", STAR_ONLY_MIXED_CASE)])
    r = out["h2"]
    assert r["crawl_delay_ms"] == 2000
    assert r["disallow_prefixes"] == ["/private"]
    assert r["allow_prefixes"] == []


def test_hosts_without_applicable_groups_are_absent(spark):
    out = _parse(spark, [("h3", NO_DIRECTIVES), ("h4", FOREIGN_ONLY)])
    assert out == {}


def test_user_agent_matching_is_case_insensitive(spark):
    out = _parse(spark, [("h1", EXACT_AND_STAR)], ua="PATHIK")
    assert out["h1"]["crawl_delay_ms"] == 500


def test_parsed_rules_drive_the_politeness_filter(spark):
    parsed = parse_robots_txt(
        spark.createDataFrame([("h1", EXACT_AND_STAR)], ["host", "robots_txt"]),
        "pathik",
    ).withColumn("max_per_round", F.lit(10))
    frontier = spark.createDataFrame(
        [
            (1, "h1", "https://h1/api/secret"),
            (2, "h1", "https://h1/ok/page"),
            (3, "h2", "https://h2/anything"),
        ],
        ["url_hash", "host", "url"],
    )
    kept = filter_disallowed(attach_robots(frontier, parsed))
    urls = {r["url"] for r in kept.collect()}
    assert urls == {"https://h1/ok/page", "https://h2/anything"}
    delays = {r["host"]: r["crawl_delay_ms"] for r in kept.collect()}
    assert delays == {"h1": 500, "h2": 0}


def test_allow_overrides_disallow_by_longest_match(spark):
    # RFC 9309 precedence: /api/public is allowed (longer allow match),
    # /api/secret is blocked, equal-length tie goes to allow
    robots = spark.createDataFrame(
        [("h1", 0, ["/api", "/x"], ["/api/public", "/x"])],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>, allow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [
            (1, "h1", "https://h1/api/secret"),
            (2, "h1", "https://h1/api/public/doc"),
            (3, "h1", "https://h1/x"),      # tie -> allow wins
            (4, "h1", "https://h1/free"),
        ],
        ["url_hash", "host", "url"],
    )
    kept = filter_disallowed(attach_robots(frontier, robots))
    assert {r["url"] for r in kept.collect()} == {
        "https://h1/api/public/doc",
        "https://h1/x",
        "https://h1/free",
    }


def test_robots_sitemap_urls(spark):
    from pathik_spark.operators.robots import robots_sitemap_urls

    rows = [
        # plain directive + uppercase field + trailing comment + dup
        (
            "h1",
            "User-agent: *\nDisallow: /p\n"
            "Sitemap: https://h1.example/sitemap.xml\n"
            "SITEMAP:   https://h1.example/news.xml   # news index\n"
            "Sitemap: https://h1.example/sitemap.xml",
        ),
        # invalid scheme filtered; localhost filtered
        (
            "h2",
            "Sitemap: ftp://h2.example/sm.xml\n"
            "Sitemap: https://localhost/sm.xml",
        ),
        # no sitemap directives at all
        ("h3", "User-agent: *\nDisallow: /"),
    ]
    df = spark.createDataFrame(rows, ["host", "robots_txt"])
    out = {(r["host"], r["url"]) for r in robots_sitemap_urls(df).collect()}
    assert out == {
        ("h1", "https://h1.example/sitemap.xml"),
        ("h1", "https://h1.example/news.xml"),
    }


def test_meta_robots_directives(spark):
    from pathik_spark.operators.robots import (
        filter_noindex,
        meta_robots_directives,
    )

    rows = [
        (1, '<meta name="robots" content="noindex, follow">'),
        (2, '<meta content="none" name="robots">'),          # reversed + none
        (3, '<META NAME="robots" CONTENT="NOFOLLOW">'),      # case
        (4, "prose mentioning noindex and nofollow only"),   # not a directive
        (5, '<meta name="robots" content="noarchive">'
            '<meta name="robots" content="nofollow">'),      # combine tags
        (6, "<html><body>plain</body></html>"),
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = {r["url"]: (r["noindex"], r["nofollow"])
           for r in meta_robots_directives(df).collect()}
    assert out == {1: (1, 0), 2: (1, 1), 3: (0, 1), 4: (0, 0),
                   5: (0, 1), 6: (0, 0)}
    kept = {r["url"] for r in filter_noindex(df).collect()}
    assert kept == {3, 4, 5, 6}


def test_wildcard_rules_rfc9309(spark):
    """RFC 9309 §2.2.3 special characters: '*' matches any character
    sequence, a trailing '$' anchors at the end of the path; other
    regex metacharacters in rules are literal; plain prefixes keep
    their semantics; specificity is rule-octet length across plain and
    wildcard rules alike."""
    robots = spark.createDataFrame(
        [
            # block any path containing .php, except exactly /index.php
            ("h1", 0, ["/*.php"], ["/index.php$"]),
            # trailing-$ anchor: /fish$ blocks only the exact path
            ("h2", 0, ["/fish$"], []),
            # literal metachars: dot must not act as regex-any
            ("h3", 0, ["/a.b"], []),
            # wildcard allow out-specifies a shorter plain disallow
            ("h4", 0, ["/private"], ["/private/*/pub"]),
        ],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>, allow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [
            (1, "h1", "https://h1/index.php"),        # exact allow anchor
            (2, "h1", "https://h1/index.php?x=1"),    # $ excludes query-extended path
            (3, "h1", "https://h1/deep/page.php"),    # *.php blocks anywhere
            (4, "h1", "https://h1/plain.html"),       # untouched
            (5, "h2", "https://h2/fish"),             # exact -> blocked
            (6, "h2", "https://h2/fishing"),          # extension -> kept
            (7, "h3", "https://h3/a.b"),              # literal match -> blocked
            (8, "h3", "https://h3/aXb"),              # '.' is NOT any-char
            (9, "h4", "https://h4/private/x/pub"),    # wildcard allow wins
            (10, "h4", "https://h4/private/x/sec"),   # disallow holds
        ],
        ["url_hash", "host", "url"],
    )
    kept = filter_disallowed(attach_robots(frontier, robots))
    assert {r["url_hash"] for r in kept.collect()} == {1, 4, 6, 8, 9}


def test_wildcard_rules_disallow_only_schema(spark):
    """The disallow-only arm (no allow_prefixes column) applies the
    same wildcard semantics."""
    robots = spark.createDataFrame(
        [("h1", 0, ["/tmp/*/cache"])],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>",
    )
    frontier = spark.createDataFrame(
        [
            (1, "h1", "https://h1/tmp/a/cache"),
            (2, "h1", "https://h1/tmp/a/keep"),
            (3, "h1", "https://h1/tmp"),
        ],
        ["url_hash", "host", "url"],
    )
    kept = filter_disallowed(attach_robots(frontier, robots))
    assert {r["url_hash"] for r in kept.collect()} == {2, 3}


def test_robots_access_policy_status_semantics(spark):
    from pathik_spark.operators.robots import robots_access_policy

    fetches = spark.createDataFrame(
        [
            ("ok.example", 200),
            ("moved.example", 301),  # chain-resolved capture: parse it
            ("missing.example", 404),
            ("forbidden.example", 403),
            ("down.example", 503),
            ("dead.example", None),  # no response at all
            # duplicated host rows: the severest verdict must win
            ("flaky.example", 200),
            ("flaky.example", 500),
        ],
        "host string, status_code int",
    )
    out = {r["host"]: r["policy"] for r in robots_access_policy(fetches).collect()}
    assert out == {
        "ok.example": "parse",
        "moved.example": "parse",
        "missing.example": "allow_all",
        "forbidden.example": "allow_all",
        "down.example": "disallow_all",
        "dead.example": "disallow_all",
        "flaky.example": "disallow_all",
    }


def test_apply_access_policy_and_exempt_filtering(spark):
    from pathik_spark.operators.robots import (
        apply_access_policy,
        robots_access_policy,
    )

    frontier = spark.createDataFrame(
        [
            ("ok.example", "http://ok.example/private/x"),
            ("ok.example", "http://ok.example/public"),
            ("missing.example", "http://missing.example/private/x"),
            ("down.example", "http://down.example/anything"),
            ("nopolicy.example", "http://nopolicy.example/private/x"),
        ],
        "host string, url string",
    )
    policies = robots_access_policy(
        spark.createDataFrame(
            [("ok.example", 200), ("missing.example", 404), ("down.example", 503)],
            "host string, status_code int",
        )
    )
    gated = apply_access_policy(frontier, policies)
    # 5xx host gone entirely; 404 host marked exempt
    got = {(r["host"], r["url"]): r["robots_exempt"] for r in gated.collect()}
    assert ("down.example", "http://down.example/anything") not in got
    assert got[("missing.example", "http://missing.example/private/x")] is True
    assert got[("ok.example", "http://ok.example/private/x")] is False
    assert got[("nopolicy.example", "http://nopolicy.example/private/x")] is False

    # a stale /private rule blocks the parse host but NOT the exempt one
    robots = spark.createDataFrame(
        [
            ("ok.example", 0, ["/private"]),
            ("missing.example", 0, ["/private"]),
            ("nopolicy.example", 0, ["/other"]),
        ],
        "host string, crawl_delay_ms long, disallow_prefixes array<string>",
    )
    kept = filter_disallowed(attach_robots(gated, robots))
    urls = {r["url"] for r in kept.collect()}
    assert urls == {
        "http://ok.example/public",
        "http://missing.example/private/x",
        "http://nopolicy.example/private/x",
    }
    assert "robots_exempt" not in kept.columns
