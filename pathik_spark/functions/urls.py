"""Spark column functions for URL derivation / validation / hashing.

Two tiers, per SURVEY.md §2.3:

- **native expressions** (whole-stage-codegen'd, usable at 100 TB scan
  scale, and translatable 1:1 to the DuckDB oracle SQL): domain-name
  derivation X1 (crawler.go:252-265), sanitize X2 (storage.go:79-119),
  filename X3 (storage.go:218-227), R2 key X4 (storage.go:129-131),
  validation F1 (crawler.go:119-159 static subset), UA selection X7
  determinized as hash-of-url (crawler.go:28-32,75-77), and the B1
  hashes (xxhash64).
- **vectorized pandas UDF** for full RFC-3986 canonicalization (dot
  segments + param sorting need real parsing); the UDF body *is* the
  normative kernel in pathik_spark.kernels.canonical, so fixture goldens
  and the Spark plan can never diverge.

The regex-based expressions are deliberately written with only
``regexp_extract / regexp_replace / replace / translate / concat`` so the
same logic can be stated in ANSI/DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathik_spark.kernels import canonical as K

# netloc = authority between scheme:// and the first /?#
_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

USER_AGENTS = [  # crawler.go:28-32
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
]


def netloc_of(url: Column) -> Column:
    """Authority component incl. port/userinfo (Go url.Parse .Host)."""
    return F.regexp_extract(url, _NETLOC_RE, 1)


def raw_hostname_of(url: Column) -> Column:
    """Lowercased hostname: netloc minus userinfo and port, trailing dot
    KEPT (matches Python urlsplit().hostname, which the kernels use for
    filename derivation and validation)."""
    host = F.regexp_replace(
        F.regexp_replace(netloc_of(url), r"^[^@]*@", ""), r":\d*$", ""
    )
    return F.lower(host)


def hostname_of(url: Column) -> Column:
    """Host identity for hashing/politeness: trailing dot stripped
    (matches kernels.canonical.url_host)."""
    return F.regexp_replace(raw_hostname_of(url), r"\.$", "")


def path_of(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def path_query_of(url: Column) -> Column:
    """Path plus query (no fragment) — the robots matching target per
    RFC 9309 §2.2.2 ("the path and, if present, the query")."""
    return F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1
    )


def domain_name_expr(url: Column) -> Column:
    """X1 — crawler.go:252-265: hostname '.'->'_', path trimmed of '/'
    then '/'->'_', joined with '_'; no host -> 'unknown'."""
    host = raw_hostname_of(url)
    domain = F.replace(host, F.lit("."), F.lit("_"))
    trimmed = F.regexp_replace(path_of(url), r"^/+|/+$", "")
    return F.when(host == "", F.lit("unknown")).otherwise(
        F.when(trimmed == "", domain).otherwise(
            F.concat_ws("_", domain, F.replace(trimmed, F.lit("/"), F.lit("_")))
        )
    )


def sanitize_url_expr(url: Column) -> Column:
    """X2 — storage.go:79-119: netloc (incl. port) + '_' + trimmed path,
    ~30 unsafe chars -> '_', '..' -> '_', truncate to 200 chars."""
    netloc = netloc_of(url)
    trimmed = F.regexp_replace(path_of(url), r"^/+|/+$", "")
    combined = F.when(
        (trimmed == "") | F.isnull(trimmed), netloc
    ).otherwise(F.concat_ws("_", netloc, trimmed))
    cleaned = F.translate(combined, K.UNSAFE_CHARS, "_" * len(K.UNSAFE_CHARS))
    cleaned = F.replace(cleaned, F.lit(".."), F.lit("_"))
    return F.substring(cleaned, 1, 200)


def filename_expr(url: Column, warc_ts: Column, file_type: str) -> Column:
    """X3 — storage.go:218-227. Date from warc_ts, never wall clock."""
    safe = file_type if file_type in ("html", "md") else "txt"
    return F.concat(
        domain_name_expr(url),
        F.lit("_"),
        F.date_format(warc_ts, "yyyy-MM-dd"),
        F.lit("." + safe),
    )


def r2_key_expr(uuid_col: Column, url: Column, file_type: str) -> Column:
    """X4 — storage.go:129-131: ``{uuid}+{sanitized}.{ext}``."""
    return F.concat(uuid_col, F.lit("+"), sanitize_url_expr(url), F.lit("." + file_type))


_PRIVATE_IP_RE = (
    r"^(127\.|10\.|192\.168\.|169\.254\.|172\.(1[6-9]|2[0-9]|3[01])\.)"
)
_IP_LITERAL_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def is_valid_url_expr(url: Column) -> Column:
    """F1 — crawler.go:119-159 static subset: http/https scheme, non-empty
    host, reject localhost and private/loopback/link-local IPv4 literals.
    (DNS resolution is intentionally omitted — deterministic.)"""
    host = raw_hostname_of(url)
    scheme_ok = url.rlike(r"^(?i)https?://")
    is_ip = host.rlike(_IP_LITERAL_RE)
    private = host.rlike(_PRIVATE_IP_RE)
    return (
        scheme_ok
        & (host != "")
        & (host != "localhost")
        & ~(is_ip & private)
    )


def user_agent_expr(url: Column) -> Column:
    """X7 determinized: the reference picks a random UA per fetch
    (crawler.go:75-77); replayable replacement = hash-of-url selection."""
    ua_array = F.array(*[F.lit(u) for u in USER_AGENTS])
    return F.element_at(ua_array, (F.pmod(F.xxhash64(url), F.lit(3)) + 1).cast("int"))


def url_hash_expr(canonical_url: Column) -> Column:
    """B1: 64-bit identity of a canonical URL (built-in xxhash64)."""
    return F.xxhash64(canonical_url)


def host_hash_expr(host: Column, num_shards: int = 4096) -> Column:
    """B1: shard key for partitioning / bloom shards / politeness groups."""
    return F.pmod(F.xxhash64(host), F.lit(num_shards))


# ---------------------------------------------------------------------------
# Canonicalization (B1): expression fast path + UDF slow path
# ---------------------------------------------------------------------------

# URLs this regex admits canonicalize identically under the pure-column
# expression and the normative kernel (property-tested): http(s) scheme,
# ASCII host with no userinfo/trailing dot/IPv6 bracket, numeric port
# 1..9999 with no leading zero (Python would re-format other ports), no
# whitespace or backslash in path/query. Everything else (a small
# minority of real-web URLs) routes through the kernel UDF.
_SIMPLE_URL_RE = (
    r"^(?i:https?)://"
    r"[A-Za-z0-9._-]*[A-Za-z0-9_-]"  # host; cannot end with '.'
    r"(:[1-9][0-9]{0,3})?"  # optional port, no leading zeros
    r"(/[^?#\s\\]*)?"  # optional path
    r"(\?[^#\s\\]*)?"  # optional query
    r"(#[^\s]*)?$"  # optional fragment (dropped)
)
def is_simple_url_expr(trimmed: Column) -> Column:
    # dot-segments need the RFC 3986 resolution loop -> kernel. Any
    # dot-segment contains the substring "/." — a plain contains() scan
    # (no regex) over-routes a few innocents like "/.well-known" to the
    # kernel, which is correct either way and far cheaper than a second
    # regex per row.
    return trimmed.rlike(_SIMPLE_URL_RE) & ~trimmed.contains("/.")


def _is_tracking_pair(pair: Column) -> Column:
    key = F.lower(F.substring_index(pair, "=", 1))
    cond = key.startswith("utm_")
    for exact in sorted(K.TRACKING_EXACT):
        cond = cond | (key == exact)
    return cond


def canonicalize_simple_expr(trimmed: Column) -> Column:
    """Pure-expression canonicalization for URLs passing
    ``is_simple_url_expr`` — whole-stage-codegen'd, no Python. Mirrors
    kernels.canonical.canonicalize_url exactly on that subset
    (lowercase scheme/host, default-port strip, dot-free path or '/',
    tracking-param strip + sort, fragment drop)."""
    no_frag = F.regexp_replace(trimmed, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    netloc = netloc_of(no_frag)
    host = F.lower(F.regexp_replace(netloc, r":[0-9]+$", ""))
    port = F.regexp_extract(netloc, r":([0-9]+)$", 1)
    path = F.regexp_extract(no_frag, _PATH_RE, 1)
    query = F.regexp_extract(no_frag, r"\?([^#]*)$", 1)
    kept = F.filter(
        F.split(query, "&"), lambda x: (x != "") & ~_is_tracking_pair(x)
    )
    sorted_q = F.array_join(F.sort_array(kept), "&")
    default_port = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    canon_netloc = F.when((port == "") | default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    canon_path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        canon_netloc,
        canon_path,
        F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def canonical_col(url_col: Column) -> Column:
    """Routed canonicalization as ONE column expression: the simple
    majority is canonicalized JVM-side; only exceptional rows
    (dot-segments, userinfo, odd ports, non-http...) reach the kernel.
    Spark extracts Python UDFs out of CASE WHEN and evaluates them for
    every row, so the routing MASKS the UDF's input instead: simple rows
    send NULL through the Arrow batch (the kernel returns None in O(1))
    and the CASE picks the expression result for them — one scan, no
    union, Python parsing only for the exceptional minority."""
    trimmed = F.trim(url_col)
    simple = F.coalesce(is_simple_url_expr(trimmed), F.lit(False))
    masked_udf = canonicalize_udf(F.when(~simple, url_col))
    return F.when(simple, canonicalize_simple_expr(trimmed)).otherwise(masked_udf)


# ---------------------------------------------------------------------------
# Vectorized pandas UDFs (Arrow-batched; bodies are the normative kernels)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(K.canonicalize_url)


@F.pandas_udf(T.BooleanType())
def validate_udf(urls: pd.Series) -> pd.Series:
    return urls.map(K.validate_url)


@F.pandas_udf(T.StringType())
def domain_name_udf(urls: pd.Series) -> pd.Series:
    return urls.map(K.domain_name_for_file)


@F.pandas_udf(T.StringType())
def sanitize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(K.sanitize_url)


def surt_key_expr(url: Column) -> Column:
    """SURT form (Sort-friendly URI Reordering Transform) — the
    canonical URL KEY of the web-archive ecosystem: Common Crawl's CDX
    index, Heritrix dedup, and Wayback lookups all sort on it, because
    reversing the host labels makes one site's URLs (and one
    organization's sites) a contiguous key range.

    ``https://WWW.Example.COM:443/a/B?z=1&a=2#f``
        -> ``com,example,www)/a/b?a=2&z=1``

    Canonicalization applied (declared, deterministic): whole URL
    lowercased; scheme, userinfo, fragment dropped; default ports
    (http:80 / https:443) dropped, others kept; host labels reversed
    comma-joined; empty path becomes ``/``; query parameters sorted
    bytewise (the ?b=2&a=1 variant collides with ?a=1&b=2 — the point
    of a key). ``www`` labels are KEPT (the transform stays invertible;
    strip-www is a policy layered above, not baked into the key).
    Pure codegen expressions — no UDF.
    """
    u = F.regexp_replace(F.lower(F.trim(url)), r"#.*$", "")
    netloc = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    no_user = F.regexp_replace(netloc, r"^[^@]*@", "")
    host = F.regexp_replace(no_user, r":\d*$", "")
    port = F.regexp_extract(no_user, r":(\d+)$", 1)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev_host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )
