"""HTTP revalidation + cache-directed recrawl TTLs (RFC 9110/9111).

A freshness-aware crawler does not blind-refetch: it replays the
validators the server handed out (``ETag`` -> ``If-None-Match``,
``Last-Modified`` -> ``If-Modified-Since``), treats ``304 Not
Modified`` as "previous body still current" (the relational twin of the
WARC ``revisit`` record, sources/sinks.warc_revisit_rows), and derives
its per-URL recrawl TTL from the server's own caching declarations
(``Cache-Control: max-age`` > ``Expires - Date`` > the RFC 9111 §4.2.2
heuristic, 10% of the Last-Modified age) instead of guessing. The
reference's fetch stack has none of this — its HTTP client refetches
unconditionally — so this family is new-build, specced directly against
the RFCs.

All times derive from table columns (response ``Date`` header with
``warc_ts`` fallback) — never the wall clock — so every output is
deterministic and replayable.

Scale shape: header parsing is scan-local expressions over the bounded
head window (shared with operators/redirects.http_response_meta); the
304 merge is ONE equi-join against the previous snapshot keyed by url —
the same key/bucket layout as pages/seen, so co-located when stored
bucketed; TTL derivation is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: IMF-fixdate (RFC 9110 §5.6.7 preferred form): Sun, 06 Nov 1994 08:49:37 GMT
_HTTP_DATE_FMT = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"
#: Spark's post-3.0 parser cannot PARSE day-of-week names (EEE is
#: format-only), and the weekday is redundant anyway — strip it first.
_HTTP_DATE_PARSE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def _http_date(col: Column) -> Column:
    return F.try_to_timestamp(
        F.regexp_replace(col, r"^[A-Za-z]+, ", ""), F.lit(_HTTP_DATE_PARSE_FMT)
    )

STATUS_REVALIDATED = "revalidated"


def _header_block(payload_col: str, head_bytes: int) -> Column:
    # binary->string CAST decodes UTF-8 with replacement chars (ANSI
    # decode() would throw on the first malformed byte of a binary body)
    head = F.substring(F.col(payload_col), 1, head_bytes).cast("string")
    return F.substring_index(head, "\r\n\r\n", 1)


def _header(hdr: Column, name: str) -> Column:
    got = F.regexp_extract(hdr, rf"(?im)^{name}:[ \t]*([^\r\n]+)", 1)
    return F.when(got != "", F.trim(got))


def http_cache_meta(
    records: DataFrame, payload_col: str = "html", head_bytes: int = 8192
) -> DataFrame:
    """(url, status_code, etag, last_modified, date, max_age_s,
    expires, no_store) parsed from raw HTTP response payloads (the
    Common-Crawl WARC ``response`` shape). ``no_store`` covers both
    ``no-store`` and ``no-cache`` (either forbids reuse-without-
    revalidation); directive matching is token-aware so an extension
    like ``no-cache-xyz`` does not trigger it."""
    hdr = _header_block(payload_col, head_bytes)
    status = F.regexp_extract(hdr, r"^HTTP/[0-9.]+ ([0-9]{3})([ \r\n]|$)", 1)
    cc = F.lower(F.coalesce(_header(hdr, "Cache-Control"), F.lit("")))
    max_age = F.regexp_extract(cc, r"(?:^|[ \t,])max-age=([0-9]+)(?:$|[ \t,;])", 1)
    # try_to_timestamp: malformed/garbage header dates are data, not
    # errors (ANSI to_timestamp would throw the task)
    return records.select(
        "url",
        *(["warc_ts"] if "warc_ts" in records.columns else []),
        F.when(status != "", status).cast("int").alias("status_code"),
        _header(hdr, "ETag").alias("etag"),
        _http_date(_header(hdr, "Last-Modified")).alias("last_modified"),
        _http_date(_header(hdr, "Date")).alias("date"),
        F.when(max_age != "", max_age).cast("long").alias("max_age_s"),
        _http_date(_header(hdr, "Expires")).alias("expires"),
        cc.rlike(r"(^|[ \t,])(no-store|no-cache)($|[ \t,;=])").alias("no_store"),
    )


def revalidation_headers(meta: DataFrame) -> DataFrame:
    """(url, if_none_match, if_modified_since): the conditional request
    headers for the NEXT fetch of each url. ETag wins when both
    validators exist (RFC 9110 §13.1.1-2: entity tags are the stronger
    validator; senders SHOULD send both when they have both, but a
    single conditional keeps the politeness budget's request shape
    fixed — and any 304 means "unchanged" either way)."""
    return meta.select(
        "url",
        F.col("etag").alias("if_none_match"),
        F.when(
            F.col("etag").isNull(),
            F.date_format(F.col("last_modified"), _HTTP_DATE_FMT),
        ).alias("if_modified_since"),
    )


def cache_ttl_hours(
    meta: DataFrame,
    default_ttl_hours: int = 24 * 7,
    min_ttl_hours: int = 1,
    max_ttl_hours: int = 24 * 30,
) -> DataFrame:
    """(url, ttl_hours, ttl_source): the per-URL recrawl TTL from the
    server's caching declarations — RFC 9111 freshness-lifetime
    precedence, clamped to [min, max]:

    - ``no-store``/``no-cache``: min_ttl_hours ('no_store');
    - ``max-age=N`` seconds ('max_age');
    - ``Expires - Date`` (Date falls back to warc_ts) ('expires');
    - heuristic: 10% of (Date - Last-Modified) — §4.2.2 ('heuristic');
    - otherwise default_ttl_hours ('default').

    This is the URL-level overlay for seen.recrawl_filter /
    delta.recrawl_filter_adaptive (whose host-churn TTLs are the
    observational twin of these declared ones)."""
    now = (
        F.coalesce(F.col("date"), F.col("warc_ts"))
        if "warc_ts" in meta.columns
        else F.col("date")
    )
    expires_h = (F.col("expires").cast("long") - now.cast("long")) / 3600.0
    heur_h = (now.cast("long") - F.col("last_modified").cast("long")) / 36000.0
    raw = (
        F.when(F.col("no_store"), F.lit(min_ttl_hours))
        .when(F.col("max_age_s").isNotNull(), F.col("max_age_s") / 3600.0)
        .when(F.col("expires").isNotNull(), expires_h)
        .when(F.col("last_modified").isNotNull(), heur_h)
        .otherwise(F.lit(default_ttl_hours))
    )
    source = (
        F.when(F.col("no_store"), F.lit("no_store"))
        .when(F.col("max_age_s").isNotNull(), F.lit("max_age"))
        .when(F.col("expires").isNotNull(), F.lit("expires"))
        .when(F.col("last_modified").isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("default"))
    )
    clamped = F.least(
        F.greatest(raw, F.lit(float(min_ttl_hours))), F.lit(float(max_ttl_hours))
    )
    return meta.select(
        "url",
        F.round(clamped, 6).alias("ttl_hours"),
        source.alias("ttl_source"),
    )


#: statuses whose Retry-After demands server-directed backoff
#: (RFC 9110 §10.2.3; 3xx Retry-After merely paces a redirect follow).
RETRY_AFTER_STATUSES = (429, 503)


def retry_after_delays(
    records: DataFrame,
    payload_col: str = "html",
    head_bytes: int = 8192,
    cap_ms: int = 3_600_000,
) -> DataFrame:
    """(host, crawl_delay_ms): the per-host delay DEMANDED by the
    server via ``Retry-After`` on 429/503 responses — both header forms
    (delta-seconds, or an HTTP-date measured against the response
    ``Date`` with ``warc_ts`` fallback). MAX per host, capped.

    This is the server-directed twin of metrics.backoff_delays (which
    infers backoff from error rates); both feed
    robots.apply_delay_overrides, whose MAX-merge keeps robots
    Crawl-delay as the floor. Scan-local parse + one tiny per-host
    aggregate (hosts, not pages, cross the shuffle)."""
    from pathik_spark.functions.urls import hostname_of

    hdr = _header_block(payload_col, head_bytes)
    status = F.regexp_extract(hdr, r"^HTTP/[0-9.]+ ([0-9]{3})([ \r\n]|$)", 1)
    ra = _header(hdr, "Retry-After")
    delta_s = F.when(ra.rlike(r"^[0-9]+$"), ra).cast("long")
    now = (
        F.coalesce(_http_date(_header(hdr, "Date")), F.col("warc_ts"))
        if "warc_ts" in records.columns
        else _http_date(_header(hdr, "Date"))
    )
    date_s = F.greatest(
        _http_date(ra).cast("long") - now.cast("long"), F.lit(0)
    )
    delay_ms = F.least(
        F.coalesce(delta_s, date_s) * 1000, F.lit(cap_ms)
    ).cast("long")
    rows = records.select(
        hostname_of(F.col("url")).alias("host"),
        F.when(status != "", status).cast("int").alias("status_code"),
        delay_ms.alias("delay_ms"),
    )
    return (
        rows.filter(
            F.col("status_code").isin(list(RETRY_AFTER_STATUSES))
            & F.col("delay_ms").isNotNull()
        )
        .groupBy("host")
        .agg(F.max("delay_ms").alias("crawl_delay_ms"))
    )


def apply_not_modified(
    fetches: DataFrame,
    prev: DataFrame,
    payload_col: str = "html",
) -> DataFrame:
    """Merge ``304 Not Modified`` responses with the previous snapshot:
    a 304 carries no body, so its row takes the PREVIOUS capture's
    payload and is marked ``status='revalidated'`` (downstream: skip
    re-extraction, emit a WARC revisit record instead of a resource
    record). Non-304 rows pass through untouched.

    ``fetches`` needs (url, status_code, ``payload_col``); ``prev``
    needs (url, ``payload_col``). One left equi-join on url — co-located
    under the shared bucket layout."""
    p = prev.select(
        F.col("url"), F.col(payload_col).alias("_prev_payload")
    )
    is_304 = F.col("status_code") == 304
    out = fetches.join(p, "url", "left")
    return out.select(
        *[
            F.when(is_304, F.col("_prev_payload")).otherwise(F.col(c)).alias(c)
            if c == payload_col
            else c
            for c in fetches.columns
        ],
        F.when(is_304, F.lit(STATUS_REVALIDATED))
        .otherwise(F.lit("fetched"))
        .alias("status"),
    )
