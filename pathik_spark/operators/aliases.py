"""rel=canonical alias resolution and canonical-group collapse.

Web pages declare a preferred URL with ``<link rel="canonical"
href=...>`` (RFC 6596). At crawl scale this is the cheapest dedup
signal there is: the page itself names its duplicate group, so a
crawler that honors it collapses print views, tracking-parameter
variants, and mirror paths WITHOUT content hashing — before the bytes
are even extracted. Common Crawl exposes the same signal in its index
for exactly this reason.

Two operators, both pure column expressions (scan-local parsing; the
only shuffle is the final group-collapse on the canonical key):

- ``extract_canonical_links``: per page, the first ``<link
  rel="canonical">`` tag's href (first-wins per RFC 6596 UA guidance;
  both attribute orders; case-insensitive tag/attr names), resolved
  against the page URL with the shared RFC 3986 resolver
  (functions/resolve.py) and validated with the frontier's own URL
  predicate (F1). Pages without a usable declaration get NULL — they
  are their own canonical (encoded as '' so result sets stay
  totally ordered).
- ``canonical_collapse``: group pages by ``coalesce(canonical_url,
  url)`` and pick one representative per alias group — the target page
  itself when it was crawled, else the lexicographically-first alias
  (deterministic under any partitioning). Emits group size so callers
  can audit how much the signal collapsed.

Reference parity: justrach/pathik fetches and stores pages one URL at
a time and has no alias handling (crawler.go keeps a per-run seen set
keyed by the raw URL); canonical collapse is the re-expression a
10^10-page corpus needs so that N tracking-parameter variants cost one
document, not N.

Scale: the tag parse is two ``regexp_extract`` calls inside the page
scan (codegen'd, no UDF). The collapse shuffles one row per page keyed
by canonical target — the same key distribution as the page-level
dedup that would otherwise run — and ``min_by`` keeps it a map-side
combinable aggregate, never a window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.resolve import resolve_reference_expr
from pathik_spark.functions import urls as U

# The first <link ...> tag carrying rel="canonical" in document order,
# either attribute order. Tag-level match first, then the href pulled
# out of the matched tag — this is what makes "first tag wins" hold
# across attribute orders with plain first-match regexp_extract.
# Single-quoted attributes are out of scope (the dominant emitters
# double-quote; same stance as discover.extract_feed_urls).
CANONICAL_TAG_RE = r'(?i)(<link[^>]*rel="canonical"[^>]*>)'
HREF_RE = r'(?i)href="([^"]*)"'


def extract_canonical_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, canonical_url) per page; '' canonical_url when the page
    declares none, declares an empty href, or the declaration does not
    resolve to a valid absolute http(s) URL."""
    tag = F.regexp_extract(F.col(html_col), CANONICAL_TAG_RE, 1)
    href = F.trim(F.regexp_extract(tag, HREF_RE, 1))
    resolved = resolve_reference_expr(F.col(url_col), href)
    # '' (not NULL) for "no usable declaration" — the engine's oracle
    # rows stay totally ordered, and coalesce/nullif downstream treats
    # the two identically.
    canonical = F.when(
        (href != "") & U.is_valid_url_expr(resolved), resolved
    ).otherwise(F.lit(""))
    return pages.select(
        F.col(url_col).alias("url"), canonical.alias("canonical_url")
    )


def canonical_collapse(
    links: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """Collapse (url, canonical_url) rows into alias groups.

    Returns one row per canonical target: ``(canonical_url, n_aliases,
    representative_url)``. The representative is the target page itself
    when present among the crawled urls (a self-canonical page or the
    target of others' declarations), otherwise the smallest alias URL —
    a deterministic arg-min, map-side combinable.
    """
    key = F.coalesce(
        F.nullif(F.col(canonical_col), F.lit("")), F.col(url_col)
    )
    rows = links.select(
        key.alias("canonical_url"), F.col(url_col).alias("url")
    )
    # rank 0 when the row IS the canonical page; min_by picks it first,
    # falling back to the smallest alias url. The struct comparison is
    # lexicographic (rank, url) — exactly the documented preference.
    rank = F.when(F.col("url") == F.col("canonical_url"), 0).otherwise(1)
    return rows.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_aliases"),
        F.min_by(
            F.col("url"), F.struct(rank.alias("rank"), F.col("url"))
        ).alias("representative_url"),
    )
