"""hreflang alternate extraction — the multilingual-cluster signal.

International sites declare their language/region variants with
``<link rel="alternate" hreflang="fr" href=...>`` tags (RFC 8288 link
relations; Google's hreflang guidelines are the de-facto spec). For a
training-data pipeline this signal is load-bearing twice:

- **multilingual corpus construction**: the declared cluster ties the
  *same document* across languages — exactly the page families a
  parallel/comparable-corpus builder wants, and the pages a
  monolingual corpus must NOT treat as independent samples;
- **crawl economics**: a confirmed cluster means one content fetch per
  language actually needed, not per discovered URL — the hreflang twin
  of rel=canonical collapse (operators/aliases.py).

The well-known catch is that the declaration is only trustworthy when
it is **mutual** (page A names B and B names A — Google ignores
one-way annotations, and so do we for grouping): link farms and
misconfigured templates emit one-way hreflang freely. So the operator
emits every declaration but flags bidirectional confirmation.

Shapes (100 TB stance):

- tag parse is ``regexp_extract_all`` + ``explode`` inside the page
  scan — scan-local, bounded by tags-per-page, no UDF;
- the mutual check joins the *alternates table* (≪ corpus: one row per
  declaration) to its own reversal on the (url, alt_url) pair key —
  an equi-join on a derived key, AQE-friendly, never touching page
  bytes.

Reference parity: justrach/pathik has no link-level analysis at all
(crawler.go fetches page bodies and stores them); hreflang intake is
training-data/new-build surface (SURVEY §2.9 family), sibling of
discover.extract_feed_urls and aliases.extract_canonical_links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.resolve import resolve_reference_expr
from pathik_spark.functions import urls as U

# Every <link ...> tag carrying an hreflang attribute; rel="alternate"
# is checked per-tag afterwards so attribute order never matters.
# Single-quoted attributes are out of scope (same stance as
# aliases.CANONICAL_TAG_RE and discover.extract_feed_urls).
HREFLANG_TAG_RE = r'(?i)<link[^>]*hreflang="[^"]*"[^>]*>'
REL_ALTERNATE_RE = r'(?i)rel="alternate"'
HREFLANG_ATTR_RE = r'(?i)hreflang="([^"]*)"'
HREF_ATTR_RE = r'(?i)href="([^"]*)"'

# BCP 47-shaped language tags as emitted in the wild (primary subtag +
# optional region/script subtags), plus the spec's literal x-default.
LANG_OK_RE = r"^([a-z]{2,3}(-[a-z0-9]{2,8})*|x-default)$"


def extract_hreflang_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, lang, alt_url) — one row per usable hreflang declaration.

    ``lang`` is the lowercased hreflang value (``x-default``
    included); declarations with a malformed language tag, an empty
    href, or an href that does not resolve (shared RFC 3986 resolver)
    to a valid absolute http(s) URL (frontier predicate F1) are
    dropped. Distinct per (url, lang, alt_url): repeated head tags
    (template double-emission) collapse here, in the scan.
    """
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREFLANG_TAG_RE), 0)
        ).alias("tag"),
    ).filter(F.col("tag").rlike(REL_ALTERNATE_RE))
    lang = F.lower(F.trim(F.regexp_extract(F.col("tag"), HREFLANG_ATTR_RE, 1)))
    href = F.trim(F.regexp_extract(F.col("tag"), HREF_ATTR_RE, 1))
    resolved = resolve_reference_expr(F.col("url"), href)
    return (
        tags.select(
            "url",
            lang.alias("lang"),
            href.alias("href"),
            resolved.alias("alt_url"),
        )
        .filter(
            F.col("lang").rlike(LANG_OK_RE)
            & (F.col("href") != "")
            & U.is_valid_url_expr(F.col("alt_url"))
        )
        .select("url", "lang", "alt_url")
        .distinct()
    )


def hreflang_alternates(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, lang, alt_url, mutual) — declarations with bidirectional
    confirmation.

    ``mutual`` = 1 when the target page was crawled and declares the
    source back under ANY language tag (the trust gate for grouping);
    self-references (a page listing itself in its own cluster — the
    spec-recommended practice) are mutual by definition. One join of
    the declaration table against its own reversed pair set — the
    corpus is never touched.
    """
    links = extract_hreflang_links(pages, html_col=html_col, url_col=url_col)
    pairs = links.select("url", "alt_url").distinct()
    rev = pairs.select(
        F.col("alt_url").alias("url"),
        F.col("url").alias("alt_url"),
        F.lit(1).alias("back"),
    ).distinct()
    out = links.join(rev, ["url", "alt_url"], "left")
    mutual = F.when(
        (F.col("url") == F.col("alt_url")) | F.col("back").isNotNull(), 1
    ).otherwise(0)
    return out.select(
        "url", "lang", "alt_url", mutual.cast("int").alias("mutual")
    )


def hreflang_clusters(links: DataFrame) -> DataFrame:
    """(url, cluster_id) — multilingual page families from MUTUAL
    declarations only.

    ``cluster_id`` is the lexicographically-smallest member URL —
    deterministic under any partitioning. Reuses the dedup family's
    large-star/small-star connected-components loop (input is one row
    per confirmed cross-page link — ≪ corpus), so the label converges
    in O(log² n) rounds at any scale. Families are ≥ 2 crawled pages
    by construction (a page whose only confirmed member is itself is
    not a cluster).
    """
    from pathik_spark.operators.dedup import connected_components

    edges = links.filter(
        (F.col("mutual") == 1) & (F.col("url") != F.col("alt_url"))
    ).select(F.col("url").alias("doc_a"), F.col("alt_url").alias("doc_b"))
    return connected_components(edges, id_a="doc_a", id_b="doc_b").select(
        F.col("doc_id").alias("url"), "cluster_id"
    )
