"""Article publication-date extraction (JSON-LD / OpenGraph / <time>).

Training-data pipelines filter and weight web text by WHEN it was
written — knowledge cutoffs, dedup across crawl snapshots (keep the
original, not the scraper copy), and temporal test splits all need a
publication date, and ``warc_ts`` only says when the CRAWLER came by.
Pages declare publication time three standard ways, extracted here in
precedence order:

  1. JSON-LD (schema.org): the first
     ``<script type="application/ld+json">`` block's ``datePublished``
     — the richest and most reliable channel (news sites emit it for
     search engines);
  2. OpenGraph: ``<meta property="article:published_time"
     content=...>`` (both attribute orders, case-insensitive — the
     sibling convention of robots.meta_robots_directives);
  3. the first ``<time datetime=...>`` element.

All pure codegen expressions (regexp + ``get_json_object`` — malformed
JSON is NULL, not an error), scan-local, no UDF. The date is the ISO
8601 date prefix (first 10 chars) — hour precision is advisory for
every downstream use. Output encodes "no declared date" as '' (the
repo's oracle-surface NULL convention).

Reference parity: justrach/pathik stores pages without any temporal
metadata beyond fetch time; publication dating is training-data
surface (SURVEY training-data family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JSONLD_RE = r'(?is)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'
OG_P1 = r'(?i)<meta[^>]*property="article:published_time"[^>]*content="([^"]*)"'
OG_P2 = r'(?i)<meta[^>]*content="([^"]*)"[^>]*property="article:published_time"'
TIME_RE = r'(?i)<time[^>]*datetime="([^"]*)"'


def _date10(raw) -> "F.Column":
    """ISO-8601 date prefix, '' when absent/unparseable — try_to_date,
    not to_date: under ANSI mode a declared-but-impossible date
    ('2017-09-31', seen in the wild) must be data, not an exception."""
    d = F.try_to_date(F.nullif(F.substring(F.trim(raw), 1, 10), F.lit("")))
    return F.coalesce(d.cast("string"), F.lit(""))


def article_dates(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, date_published, date_source) per page. ``date_source`` is
    'jsonld' | 'og' | 'time' | '' — which channel supplied the date
    under the precedence above ('' = no parseable declaration)."""
    html = F.col(html_col)
    ld_block = F.regexp_extract(html, JSONLD_RE, 1)
    ld_raw = F.get_json_object(ld_block, "$.datePublished")
    og_raw = F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(html, OG_P1, 1), F.lit("")),
            F.regexp_extract(html, OG_P2, 1),
        ),
        F.lit(""),
    )
    time_raw = F.nullif(F.regexp_extract(html, TIME_RE, 1), F.lit(""))
    ld_date = _date10(ld_raw)
    og_date = _date10(og_raw)
    time_date = _date10(time_raw)
    date = F.when(ld_date != "", ld_date).when(og_date != "", og_date).otherwise(
        time_date
    )
    source = (
        F.when(ld_date != "", F.lit("jsonld"))
        .when(og_date != "", F.lit("og"))
        .when(time_date != "", F.lit("time"))
        .otherwise(F.lit(""))
    )
    return pages.select(
        F.col(url_col).alias("url"),
        date.alias("date_published"),
        source.alias("date_source"),
    )
