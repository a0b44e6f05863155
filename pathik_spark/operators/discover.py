"""Link discovery: outlinks of fetched pages become next-round frontier
candidates (SURVEY.md §2.7 — frontier ∪ discovered, per round).

The sandbox replaces live link extraction with the ``links(src_url,
dst_url)`` fixture table (FIXTURES.md §4); on a real corpus this would
be an href-extraction pandas UDF over the html column feeding the same
shape. Discovery order is made deterministic: new candidates get
``seq = seq_base + dense_rank over (parent seq, dst_url)`` and the
lowest discovery priority.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions import urls as U
from pathik_spark.operators.scheduler import scalable_global_rank

DISCOVERED_PRIORITY = 2


def discover_links(
    links: DataFrame,
    fetched: DataFrame,
    seq_base: int,
    prepared: bool = False,
    persisted: list | None = None,
) -> DataFrame:
    """Returns seeds-shaped rows (url, seq, priority) for the next round.

    Join identity: canonical url_hash of the link source vs the fetched
    set. The fetched side is one round's output — explicitly broadcast so
    the full link graph never shuffles. ``prepared=True`` means links
    already carry src_hash (materialized once per run by the driver).
    """
    if prepared:
        src = links
    else:
        src = links.withColumn(
            "src_hash", U.url_hash_expr(U.canonical_col(F.col("src_url")))
        )
    fetched_keys = fetched.select(
        F.col("url_hash").alias("src_hash"), F.col("seq").alias("parent_seq")
    )
    out = src.join(F.broadcast(fetched_keys), "src_hash")
    dedup = out.select("parent_seq", F.col("dst_url").alias("url")).distinct()
    return _rank_discovered(dedup, seq_base, persisted)


def discover_from_outlinks(
    arts: DataFrame, seq_base: int, persisted: list | None = None
) -> DataFrame:
    """From-html discovery: the artifacts' own ``outlinks`` column (hrefs
    extracted by the fused UDF in the same parse as text/markdown) becomes
    next-round candidates — NO join against a link graph at all, and no
    second pass over the corpus. Same deterministic seq assignment as
    discover_links, so the two modes schedule identically given identical
    link sets."""
    fetched = arts.filter(F.col("status") == "fetched")
    dedup = fetched.select(
        F.col("seq").alias("parent_seq"), F.explode("outlinks").alias("url")
    ).distinct()
    return _rank_discovered(dedup, seq_base, persisted)


def _rank_discovered(
    dedup: DataFrame, seq_base: int, persisted: list | None
) -> DataFrame:
    ranked = scalable_global_rank(dedup, ["parent_seq", "url"], "_dr", persisted=persisted)
    return (
        ranked.withColumn("seq", F.lit(seq_base) + F.col("_dr").cast("long"))
        .withColumn("priority", F.lit(DISCOVERED_PRIORITY))
        .select("url", "seq", "priority")
    )


def extract_sitemap_urls(
    sitemaps: DataFrame,
    content_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """Seed intake from sitemap XML (urlset or sitemapindex): pull every
    ``<loc>`` entry, trim, dedup per host. Pure regexp_extract_all +
    explode — codegen'd, shuffle only for the final distinct, so 10^8
    sitemap documents parse inside their scan tasks.

    Returns (host, url) distinct rows, valid-URL-filtered with the same
    predicate the frontier applies (F1), ready to union into seeds."""
    locs = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.expr(f"regexp_extract_all({content_col}, '<loc>\\\\s*([^<]+?)\\\\s*</loc>', 1)")
        ).alias("url"),
    ).select("host", F.trim(F.col("url")).alias("url"))
    return locs.filter(U.is_valid_url_expr(F.col("url"))).distinct()


def classify_sitemap_locs(
    sitemaps: DataFrame,
    content_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """(host, url, kind) with kind ∈ {'page', 'sitemap'}: block-scoped
    ``<loc>`` extraction that tells a ``<url>`` entry (a page seed)
    from a ``<sitemap>`` entry (a CHILD SITEMAP listed by a
    sitemapindex — sitemaps.org caps urlsets at 50k URLs, so any large
    site fronts one). extract_sitemap_urls alone would feed child
    sitemap XML files into the page frontier; routing 'sitemap' rows
    back into the sitemap fetch list instead recurses the index one
    level per crawl round (real-world indexes are 1-2 levels deep).

    Same scan-local shape as extract_sitemap_entries: block
    regexp_extract_all + per-block loc, F1 validity, per-host distinct
    (duplicate locs keep 'sitemap' — fetching as a sitemap is the safe
    reading)."""

    def _locs(tag: str, kind: str) -> DataFrame:
        blocks = sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.expr(
                    f"regexp_extract_all({content_col}, '<{tag}>(.*?)</{tag}>', 1)"
                )
            ).alias("block"),
        )
        return blocks.select(
            "host",
            F.trim(
                F.regexp_extract(F.col("block"), r"<loc>\s*([^<]+?)\s*</loc>", 1)
            ).alias("url"),
            F.lit(kind).alias("kind"),
        ).filter(U.is_valid_url_expr(F.col("url")))

    both = _locs("url", "page").unionByName(_locs("sitemap", "sitemap"))
    # one row per (host, url): 'sitemap' outranks 'page' (min of the
    # kind string — 'page' < 'sitemap' alphabetically, so max picks it)
    return both.groupBy("host", "url").agg(F.max("kind").alias("kind"))


def extract_sitemap_entries(
    sitemaps: DataFrame,
    content_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """Sitemap seed intake WITH freshness: each ``<url>`` block's
    ``<loc>`` paired with its ``<lastmod>`` (sitemaps.org W3C datetime;
    the date prefix is kept — hour precision is advisory). The lastmod
    feeds the adaptive-recrawl machinery directly: a frontier joined on
    this table can skip URLs whose lastmod predates the seen timestamp
    (delta.recrawl_filter_adaptive's TTL law gets a per-URL signal
    instead of a per-host one).

    Same scan-local shape as extract_sitemap_urls, block-scoped so a
    lastmod can never attach to a neighboring loc: regexp_extract_all
    over ``<url>`` blocks, per-block loc/lastmod extraction, F1
    validity filter; duplicate locs keep the NEWEST lastmod (max, nulls
    lose). Returns (host, url, lastmod date-or-null).
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.expr(
                f"regexp_extract_all({content_col}, '<url>(.*?)</url>', 1)"
            )
        ).alias("block"),
    )
    parsed = blocks.select(
        "host",
        F.trim(
            F.regexp_extract(F.col("block"), r"<loc>\s*([^<]+?)\s*</loc>", 1)
        ).alias("url"),
        F.to_date(
            F.nullif(
                F.substring(
                    F.trim(
                        F.regexp_extract(
                            F.col("block"), r"<lastmod>\s*([^<]+?)\s*</lastmod>", 1
                        )
                    ),
                    1,
                    10,
                ),
                F.lit(""),
            )
        ).alias("lastmod"),
    )
    return (
        parsed.filter(U.is_valid_url_expr(F.col("url")))
        .groupBy("host", "url")
        .agg(F.max("lastmod").alias("lastmod"))
    )


def extract_feed_urls(
    feeds: DataFrame,
    content_col: str = "feed_xml",
    host_col: str = "host",
) -> DataFrame:
    """Seed intake from syndication feeds — the other standing URL
    source a crawler polls besides sitemaps (reference scope: seed
    intake, SURVEY.md §2.1 S1). Covers both wire formats:

    - RSS 2.0: ``<link>url</link>`` (channel and item level) and
      permalink ``<guid>``s that carry an http(s) URL;
    - Atom: ``<link ... href="url" .../>``.

    Same shape as extract_sitemap_urls: pure regexp_extract_all +
    explode — codegen'd, scan-local parsing, shuffle only for the final
    per-host distinct. Returns (host, url) distinct, valid-URL-filtered
    with the frontier's own predicate (F1). Single-quoted Atom href
    attributes are out of scope (the dominant emitters double-quote).
    """
    rss = "regexp_extract_all({c}, '(?i)<link>\\\\s*([^<]+?)\\\\s*</link>', 1)"
    atom = "regexp_extract_all({c}, '(?i)<link[^>]*href=\"([^\"]+)\"', 1)"
    guid = "regexp_extract_all({c}, '(?i)<guid[^>]*>\\\\s*(http[^<]*?)\\\\s*</guid>', 1)"
    locs = feeds.select(
        F.col(host_col).alias("host"),
        F.explode(F.expr(f"concat({', '.join(p.format(c=content_col) for p in (rss, atom, guid))})")).alias("url"),
    ).select("host", F.trim(F.col("url")).alias("url"))
    return locs.filter(U.is_valid_url_expr(F.col("url"))).distinct()


def discover_feed_links(
    pages: DataFrame,
    html_col: str = "html",
    host_col: str = "host",
) -> DataFrame:
    """Feed AUTODISCOVERY from crawled HTML: the standard
    ``<link rel="alternate" type="application/rss+xml|atom+xml"
    href=...>`` head tags, both attribute orders (type-then-href and
    href-then-type). Returns (host, feed_url) distinct — the polling
    list that extract_feed_urls later consumes. Scan-local regexp work,
    one distinct shuffle."""
    p1 = (
        "regexp_extract_all({c}, "
        "'(?i)<link[^>]*type=\"application/(?:rss|atom)\\\\+xml\"[^>]*href=\"([^\"]+)\"', 1)"
    )
    p2 = (
        "regexp_extract_all({c}, "
        "'(?i)<link[^>]*href=\"([^\"]+)\"[^>]*type=\"application/(?:rss|atom)\\\\+xml\"', 1)"
    )
    locs = pages.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.expr(f"concat({p1.format(c=html_col)}, {p2.format(c=html_col)})")
        ).alias("feed_url"),
    ).select("host", F.trim(F.col("feed_url")).alias("feed_url"))
    return locs.filter(U.is_valid_url_expr(F.col("feed_url"))).distinct()


def discover_seeds(
    sitemap_entries: DataFrame | None = None,
    feed_urls: DataFrame | None = None,
    robots_sitemaps: DataFrame | None = None,
    now=None,
    canonical_links: DataFrame | None = None,
) -> DataFrame:
    """Unified seed intake: one CrawlRun-ready (url, seq, priority)
    table from the standing discovery channels —

    - ``sitemap_entries`` (extract_sitemap_entries output): priority
      from ``lastmod`` recency vs ``now`` (a date/timestamp COLUMN or
      literal — never wall clock, the repo's replayability rule):
      tier 0 <= 7 days, 1 <= 30, 2 <= 365, 3 older/unknown;
    - ``feed_urls`` (extract_feed_urls output): feeds announce new
      content, so entries default to tier 1;
    - ``robots_sitemaps`` (robots_sitemap_urls output): sitemap
      archives to FETCH, tier 0 — crawling them unlocks everything
      they list;
    - ``canonical_links`` (aliases.extract_canonical_links output):
      rel=canonical targets DIFFERENT from the declaring page — the
      site says the preferred representation lives there, so content
      is known to exist: tier 1. Self-canonical and undeclared rows
      contribute nothing.

    ``seq`` (the scheduler's FIFO tie-break) is the portable 60-bit
    hash of the url — deterministic and partitioning-independent
    without the single-partition global window a row_number seq would
    need at 10^10. First-(priority, seq) dedup across channels is
    prepare_frontier's own job; this just unions the channels.
    """
    from pathik_spark.operators.dedup import portable_hash64

    parts = []
    if sitemap_entries is not None:
        if now is None:
            # a null now would NULL every datediff and silently dump
            # all lastmod-bearing URLs into tier 3 — the exact signal
            # this operator exists to keep
            raise ValueError(
                "discover_seeds: sitemap_entries given but now is None — "
                "pass the reference date the freshness tiers are cut at"
            )
        from pyspark.sql import Column

        now_col = now if isinstance(now, Column) else F.lit(now)
        age = F.datediff(now_col.cast("date"), F.col("lastmod"))
        tier = (
            F.when(F.col("lastmod").isNull(), F.lit(3))
            .when(age <= 7, F.lit(0))
            .when(age <= 30, F.lit(1))
            .when(age <= 365, F.lit(2))
            .otherwise(F.lit(3))
        )
        parts.append(sitemap_entries.select("url", tier.alias("priority")))
    if feed_urls is not None:
        parts.append(feed_urls.select("url", F.lit(1).alias("priority")))
    if robots_sitemaps is not None:
        parts.append(robots_sitemaps.select("url", F.lit(0).alias("priority")))
    if canonical_links is not None:
        parts.append(
            canonical_links.filter(
                (F.col("canonical_url") != "")
                & (F.col("canonical_url") != F.col("url"))
            ).select(
                F.col("canonical_url").alias("url"), F.lit(1).alias("priority")
            )
        )
    if not parts:
        raise ValueError("discover_seeds: no discovery channel given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "url",
        F.pmod(portable_hash64(F.col("url")), F.lit(1_000_000_000_000)).alias("seq"),
        F.col("priority").cast("int").alias("priority"),
    )


def decode_sitemap_payloads(
    sitemaps: DataFrame,
    content_col: str = "sitemap_xml",
    out_col: str = "sitemap_xml",
) -> DataFrame:
    """Fetched sitemap payloads -> XML text. Real sitemaps ship as
    ``sitemap.xml.gz`` at least as often as plain XML (the protocol
    caps a file at 50 MB uncompressed, so large sites always gzip);
    this decodes gzip-magic payloads (multi-member tolerated, same
    decoder as the WARC source) and passes plain bytes/text through,
    with replacement-character UTF-8 decoding — a malformed byte in
    one sitemap is data, not a task failure. Feed the result to
    extract_sitemap_urls / extract_sitemap_entries / classify_*."""
    from pyspark.sql import types as T

    col_type = sitemaps.schema[content_col].dataType
    if isinstance(col_type, T.StringType):
        return sitemaps.withColumnRenamed(content_col, out_col) \
            if content_col != out_col else sitemaps

    @F.pandas_udf(T.StringType())
    def _decode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from pathik_spark.sources.warc_source import gunzip_members

        for s in it:
            out = []
            for b in s:
                raw = bytes(b or b"")
                if raw[:2] == b"\x1f\x8b":
                    raw = gunzip_members(raw)
                out.append(raw.decode("utf-8", errors="replace"))
            yield pd.Series(out)

    return sitemaps.withColumn(out_col, _decode(F.col(content_col))).drop(
        *([content_col] if content_col != out_col else [])
    )
