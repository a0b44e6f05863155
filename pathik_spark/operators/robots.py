"""Robots / politeness control-table join (J4/B3 — new-build per
north_rule; nearest reference anchor is the global limiter
crawler/crawler.go:26).

The robots table is per-host and small relative to the frontier
(≤ hundreds of millions of hosts vs 10^10 URLs), so the join is an
explicit ``broadcast`` hash join — no shuffle of the frontier side.
Disallow rules are evaluated with the built-in ``exists`` higher-order
function on the path column (codegen'd, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions import urls as U

DEFAULT_CRAWL_DELAY_MS = 0
DEFAULT_MAX_PER_ROUND = 1_000_000_000


def attach_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Left-join per-host budgets; hosts without a robots row get the
    defaults (crawl ok, no delay). ``allow_prefixes`` (emitted by
    parse_robots_txt) rides along when the robots table has it."""
    cols = [
        F.col("host"),
        F.col("crawl_delay_ms").cast("long").alias("crawl_delay_ms"),
        F.col("disallow_prefixes"),
    ]
    has_allow = "allow_prefixes" in robots.columns
    if has_allow:
        cols.append(F.col("allow_prefixes"))
    if "max_per_round" in robots.columns:
        cols.append(F.col("max_per_round").cast("int").alias("max_per_round"))
    else:
        cols.append(F.lit(None).cast("int").alias("max_per_round"))
    rb = robots.select(*cols)
    joined = frontier.join(F.broadcast(rb), "host", "left")
    out = [
        frontier["*"],
        F.coalesce(F.col("crawl_delay_ms"), F.lit(DEFAULT_CRAWL_DELAY_MS)).alias(
            "crawl_delay_ms"
        ),
        F.coalesce(F.col("max_per_round"), F.lit(DEFAULT_MAX_PER_ROUND)).alias(
            "max_per_round"
        ),
        F.coalesce(F.col("disallow_prefixes"), F.array()).alias("disallow_prefixes"),
    ]
    if has_allow:
        out.append(F.coalesce(F.col("allow_prefixes"), F.array()).alias("allow_prefixes"))
    return joined.select(*out)


# regex metacharacters to neutralize in a robots rule — everything
# except '*' (RFC 9309 wildcard) which maps to '.*'; a trailing '$'
# (end-of-URL anchor) is handled positionally below
_RULE_META = r"([\\^$.|?+(){}\[\]])"


def _rule_pattern(p):
    """robots path rule -> anchored Java regex (RFC 9309 §2.2.3):
    '*' matches any character sequence, a TRAILING '$' anchors at the
    end of the path; any other regex metacharacter (including a
    mid-rule '$') is literal. Pure string expressions — stays inside
    codegen."""
    esc = F.regexp_replace(p, _RULE_META, r"\\$1")
    wld = F.regexp_replace(esc, r"\*", ".*")
    anchored = F.when(
        F.endswith(p, F.lit("$")),
        # the escape pass turned the trailing '$' into '\$' (2 chars):
        # strip it and re-append the real anchor
        F.concat(
            F.substr(wld, F.lit(1), F.length(wld) - F.lit(2)), F.lit("$")
        ),
    ).otherwise(wld)
    return F.concat(F.lit("^"), anchored)


def _rule_matches(path, p):
    """One rule against one path: plain rules (no '*', no trailing
    '$') keep the fast startswith path; wildcard rules go through the
    converted regex."""
    simple = (F.instr(p, "*") == 0) & ~F.endswith(p, F.lit("$"))
    return F.when(simple, F.startswith(path, p)).otherwise(
        F.regexp_like(path, _rule_pattern(p))
    )


def _longest_match_len(rules, path):
    """Length (rule octets — the RFC 9309 specificity measure, also
    what Google's matcher uses for wildcard rules) of the most specific
    rule matching ``path`` (0 when none): filter + transform +
    array_max, all codegen'd."""
    matched = F.transform(
        F.filter(rules, lambda p: _rule_matches(path, p)),
        lambda p: F.length(p),
    )
    return F.coalesce(F.array_max(matched), F.lit(0))


def filter_disallowed(frontier_with_robots: DataFrame) -> DataFrame:
    """Drop URLs blocked by the robots rules. With only
    ``disallow_prefixes`` present: blocked = any disallow rule matches
    the path. When ``allow_prefixes`` is also present (parse_robots_txt
    output), RFC 9309 longest-match precedence applies: the rule with
    the most matching octets wins, Allow winning ties. Rules may use
    the RFC 9309 special characters '*' (any sequence) and trailing
    '$' (end anchor); plain prefixes keep the startswith fast path.
    Rules match against path PLUS query (RFC 9309 §2.2.2)."""
    df = frontier_with_robots
    path = U.path_query_of(F.col("url"))
    dis_len = _longest_match_len(F.col("disallow_prefixes"), path)
    if "allow_prefixes" in df.columns:
        blocked = dis_len > _longest_match_len(F.col("allow_prefixes"), path)
        dropped = ["disallow_prefixes", "allow_prefixes"]
    else:
        blocked = dis_len > 0
        dropped = ["disallow_prefixes"]
    if "robots_exempt" in df.columns:
        # apply_access_policy marked the host allow_all (its robots.txt
        # 404'd): any rules that rode along are stale — never block
        blocked = blocked & ~F.col("robots_exempt")
        dropped.append("robots_exempt")
    return df.filter(~blocked).drop(*dropped)


POLICY_PARSE = "parse"
POLICY_ALLOW_ALL = "allow_all"
POLICY_DISALLOW_ALL = "disallow_all"


def robots_access_policy(
    fetches: DataFrame,
    host_col: str = "host",
    status_col: str = "status_code",
) -> DataFrame:
    """RFC 9309 §2.3.1 fetch-status semantics for the robots.txt fetch
    itself — (host, policy):

    - 2xx: ``parse`` — feed the body to parse_robots_txt as usual;
    - 4xx (incl. 404, and the no-row "unreachable-with-an-answer"
      case): ``allow_all`` — "MAY access any resources" when robots.txt
      is unavailable;
    - 5xx / no response: ``disallow_all`` — "MUST assume complete
      disallow" while the file is unreachable (the RFC lets a crawler
      relax this after a long outage; model that upstream by aging
      hosts out of the fetch table);
    - 3xx: ``parse`` of whatever body the redirect chain ended at —
      resolve chains FIRST (operators/redirects.resolve_redirects, the
      RFC says to follow at least five hops) and feed the final
      capture's (host, status) here.

    One row per host (worst status wins: 5xx > everything, then 2xx/3xx
    over 4xx is irrelevant since a host fetches robots.txt once — the
    max() is a determinism guard for duplicated rows). Scan-local
    expression + one tiny per-host aggregate."""
    status = F.col(status_col)
    # rank so that max() picks the severest verdict on duplicates
    verdict = (
        F.when(status.isNull() | (status >= 500), F.lit(2))
        .when((status >= 400) & (status < 500), F.lit(0))
        .otherwise(F.lit(1))
    )
    agg = (
        fetches.select(F.col(host_col).alias("host"), verdict.alias("v"))
        .groupBy("host")
        .agg(F.max("v").alias("v"))
    )
    return agg.select(
        "host",
        F.when(F.col("v") == 2, F.lit(POLICY_DISALLOW_ALL))
        .when(F.col("v") == 0, F.lit(POLICY_ALLOW_ALL))
        .otherwise(F.lit(POLICY_PARSE))
        .alias("policy"),
    )


def apply_access_policy(
    frontier: DataFrame, policies: DataFrame
) -> DataFrame:
    """Enforce robots_access_policy on a frontier BEFORE rule
    filtering: hosts under ``disallow_all`` drop entirely; hosts under
    ``allow_all`` get ``robots_exempt=true`` so filter_disallowed's
    rule matching is bypassed for them (their rules table, if any, is
    stale); ``parse`` hosts (and hosts with no policy row) flow
    unchanged with ``robots_exempt=false``. Broadcast join — the
    policy table is per-host."""
    joined = frontier.join(F.broadcast(policies), "host", "left")
    return joined.filter(
        F.coalesce(F.col("policy") != POLICY_DISALLOW_ALL, F.lit(True))
    ).select(
        *[F.col(c) for c in frontier.columns],
        (F.coalesce(F.col("policy") == POLICY_ALLOW_ALL, F.lit(False))).alias(
            "robots_exempt"
        ),
    )


def parse_robots_txt(
    robots_docs: DataFrame,
    user_agent: str = "pathik",
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Parse raw robots.txt bodies into the per-host rules table the
    politeness pipeline consumes — entirely relationally (explode lines
    -> window group-ids -> group selection -> rule aggregation), no
    Python in the path, so 10^8 hosts parse as one windowed plan
    partitioned by host.

    Implemented subset of RFC 9309 grouping (documented simplifications:
    unknown fields and blank lines are dropped before grouping rather
    than acting as separators):

    - ``#`` comments stripped, fields case-insensitive;
    - consecutive ``User-agent`` lines open ONE group; rules follow
      until the next User-agent run;
    - all groups naming the crawler's exact token (case-insensitive)
      are merged; if none exist, the ``*`` groups are merged instead;
    - Disallow/Allow values collected as sorted distinct prefix arrays
      (empty values dropped — "Disallow:" means allow-all);
    - ``Crawl-delay`` (seconds, fractional ok) -> minimum across chosen
      groups, returned as ``crawl_delay_ms`` (null when absent).

    Returns (host, crawl_delay_ms, disallow_prefixes, allow_prefixes).
    """
    from pyspark.sql import Window

    ua = user_agent.lower()
    lines = robots_docs.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "line"),
    )
    directives = (
        lines.select(
            "host",
            "pos",
            F.trim(F.regexp_replace(F.col("line"), "#.*$", "")).alias("line"),
        )
        .filter(F.col("line").contains(":"))
        .select(
            "host",
            "pos",
            F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("field"),
            F.trim(
                F.expr("substring(line, instr(line, ':') + 1, length(line))")
            ).alias("value"),
        )
        .filter(F.col("field").isin("user-agent", "disallow", "allow", "crawl-delay"))
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    grouped = directives.withColumn(
        "_start",
        ((is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)).cast("int"),
    ).withColumn("group_id", F.sum("_start").over(w))

    groups = grouped.groupBy("host", "group_id").agg(
        F.max(
            ((F.col("field") == "user-agent") & (F.lower("value") == ua)).cast("int")
        ).alias("has_exact"),
        F.max(
            ((F.col("field") == "user-agent") & (F.col("value") == "*")).cast("int")
        ).alias("has_star"),
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        (F.col("field") == "disallow") & (F.col("value") != ""),
                        F.col("value"),
                    )
                )
            )
        ).alias("disallow"),
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        (F.col("field") == "allow") & (F.col("value") != ""),
                        F.col("value"),
                    )
                )
            )
        ).alias("allow"),
        F.min(
            F.when(F.col("field") == "crawl-delay", F.col("value").cast("double"))
        ).alias("delay_s"),
    )
    host_mode = groups.groupBy("host").agg(F.max("has_exact").alias("any_exact"))
    chosen = groups.join(host_mode, "host").filter(
        ((F.col("any_exact") == 1) & (F.col("has_exact") == 1))
        | ((F.col("any_exact") == 0) & (F.col("has_star") == 1))
    )
    return chosen.groupBy("host").agg(
        (F.min("delay_s") * 1000).cast("long").alias("crawl_delay_ms"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("disallow")))).alias(
            "disallow_prefixes"
        ),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("allow")))).alias(
            "allow_prefixes"
        ),
    )


def _overlay_host_column(
    robots: DataFrame, overrides: DataFrame, col: str, cast_type: str, merge
) -> DataFrame:
    """Shared overlay core for apply_budget_overrides /
    apply_delay_overrides: full-outer on host (an override-only host
    still gets a row — attach_robots coalesces its missing rule
    columns), stable column order, ``merge(override, robots_value)``
    decides the final value. Both sides are host-count-sized — the
    frontier is never touched."""
    ovr = overrides.select("host", F.col(col).cast(cast_type).alias("_ovr"))
    base = robots
    if col not in base.columns:
        base = base.withColumn(col, F.lit(None).cast(cast_type))
    merged = base.join(ovr, "host", "full_outer")
    cols = ["host"] + [c for c in base.columns if c not in ("host", col)]
    return merged.select(
        *[F.col(c) for c in cols], merge(F.col("_ovr"), F.col(col)).alias(col)
    )


def apply_budget_overrides(robots: DataFrame, budgets: DataFrame) -> DataFrame:
    """Overlay adaptive per-host budgets (metrics.backoff_budgets
    output: host, max_per_round) onto the robots rules table before
    ``attach_robots``. The override WINS over any robots-side
    ``max_per_round``."""
    return _overlay_host_column(
        robots, budgets, "max_per_round", "int", lambda o, r: F.coalesce(o, r)
    )


def apply_delay_overrides(robots: DataFrame, delays: DataFrame) -> DataFrame:
    """Overlay adaptive per-host crawl delays (metrics.backoff_delays
    output: host, crawl_delay_ms). MAX-merged with the robots-side
    delay — adaptive backoff may slow a host beyond its declared
    Crawl-delay, never below it (politeness is a floor, not a
    ceiling)."""
    return _overlay_host_column(
        robots,
        delays,
        "crawl_delay_ms",
        "long",
        # NULL on either side means "the default delay", not 0 — so the
        # max-merge floor tracks DEFAULT_CRAWL_DELAY_MS and stays
        # correct if the default ever becomes non-zero.
        lambda o, r: F.greatest(
            F.coalesce(o, F.lit(DEFAULT_CRAWL_DELAY_MS)),
            F.coalesce(r, F.lit(DEFAULT_CRAWL_DELAY_MS)),
        ),
    )


def robots_sitemap_urls(
    robots_docs: DataFrame,
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """``Sitemap:`` directive extraction from robots.txt — the primary
    sitemap-discovery channel real crawlers use (sitemaps.org protocol;
    RFC 9309 treats these as "other records", independent of any
    User-agent group, so they apply file-wide and are collected without
    group selection).

    Same relational shape as ``parse_robots_txt``'s line stage and
    ``discover.extract_sitemap_urls``: line explode, comment strip,
    case-insensitive field match, F1 validity filter, per-host distinct
    — pure codegen'd expressions, scan-local parsing, shuffle only for
    the final distinct. The output (host, url) feeds the sitemap fetch
    list whose bodies ``extract_sitemap_urls`` then parses, closing the
    robots.txt -> sitemap -> seed-URL discovery loop.
    """
    lines = robots_docs.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(content_col), "\n")).alias("raw"),
    )
    cleaned = lines.select(
        "host", F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line")
    ).filter(F.col("line").contains(":"))
    directives = cleaned.select(
        "host",
        F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("field"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1, length(line))")
        ).alias("url"),
    )
    return (
        directives.filter(F.col("field") == "sitemap")
        .filter(U.is_valid_url_expr(F.col("url")))
        .select("host", "url")
        .distinct()
    )


def meta_robots_directives(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Page-level robots compliance: ``<meta name="robots"
    content="...">`` directives (the REP's HTML arm next to the
    robots.txt file arm). ``noindex`` pages must not enter the corpus,
    ``nofollow`` pages must not contribute outlinks to the frontier;
    ``none`` means both (Google's documented semantics). Token-exact
    matching over the comma-split directive list — a page whose text
    merely mentions 'noindex' is not affected.

    Scan-local regexp work like discover.discover_feed_links (both
    attribute orders, case-insensitive, every robots meta tag on the
    page combined; single-quoted attributes out of scope — the dominant
    emitters double-quote). Adds (noindex, nofollow) int columns.
    """
    p1 = (
        f"regexp_extract_all(CAST({html_col} AS STRING), "
        "'(?i)<meta[^>]*name=\"robots\"[^>]*content=\"([^\"]*)\"', 1)"
    )
    p2 = (
        f"regexp_extract_all(CAST({html_col} AS STRING), "
        "'(?i)<meta[^>]*content=\"([^\"]*)\"[^>]*name=\"robots\"', 1)"
    )
    toks = (
        f"flatten(transform(concat({p1}, {p2}), "
        "c -> transform(split(c, ','), t -> lower(trim(t)))))"
    )
    return pages.select(
        "*",
        F.expr(
            f"CAST(exists({toks}, t -> t = 'noindex' OR t = 'none') AS INT)"
        ).alias("noindex"),
        F.expr(
            f"CAST(exists({toks}, t -> t = 'nofollow' OR t = 'none') AS INT)"
        ).alias("nofollow"),
    )


def filter_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta forbids indexing — run before any
    corpus sink (scan-local filter, no shuffle)."""
    out = meta_robots_directives(pages, html_col=html_col)
    return out.filter(F.col("noindex") == 0).drop("noindex", "nofollow")
