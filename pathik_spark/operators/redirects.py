"""Redirect-chain resolution: follow 3xx hops relationally.

The reference's fetch stack follows redirects inside the headless
browser / Go HTTP client (Go ``net/http`` stops after 10 hops), so a
redirect chain is invisible to it — the final page simply arrives.
Re-expressed over a fetch-results table, chain following is an explicit
operator: each hop is one equi-join of the still-walking rows against
the redirect map (source url -> resolved Location target), with loop
detection against the accumulated visited set and a hop cap.

Scale shape (10^10 rows): the corpus splits ONCE into non-redirect rows
(terminal immediately — they never enter any join) and the redirect
subset (real crawls: a few percent). All ``max_hops`` joins run over
that small subset against the equally small redirect map, shuffling on
the url key each hop (pointer-chasing is inherently one shuffle per
hop; chains are short — the cap bounds the plan depth). The visited
array holds at most ``max_hops + 1`` short strings per walking row.
The whole thing is one lazy Catalyst plan — no driver iteration, no
collect, no checkpoint needed at depth <= 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.resolve import resolve_reference_expr

#: HTTP statuses that carry a Location to follow.
REDIRECT_STATUSES = (301, 302, 303, 307, 308)

#: Go net/http's CheckRedirect default ("stopped after 10 redirects") —
#: the reference's effective chain bound.
MAX_HOPS = 10

TERMINAL_FINAL = "final"
TERMINAL_LOOP = "loop"
TERMINAL_MAX_HOPS = "max_hops"


def http_response_meta(
    records: DataFrame, payload_col: str = "html", head_bytes: int = 8192
) -> DataFrame:
    """(url, status_code, location, mime) parsed from raw HTTP response
    payloads — the Common-Crawl WARC ``response`` record shape
    (``application/http; msgtype=response``), where the payload is the
    status line + headers + CRLFCRLF + body. This is the glue between
    sources/warc_source.read_warc_archives and
    :func:`resolve_redirects`.

    Scan-local JVM expressions over a bounded head window (headers are
    ASCII; the window is decoded with replacement semantics so binary
    bodies never throw). Rows whose payload is not an HTTP response
    (resource/conversion records) get NULL status_code."""
    # binary->string CAST decodes UTF-8 with replacement chars (ANSI
    # decode() would throw on the first malformed byte of a binary body)
    head = F.substring(F.col(payload_col), 1, head_bytes).cast("string")
    hdr = F.substring_index(head, "\r\n\r\n", 1)
    status = F.regexp_extract(hdr, r"^HTTP/[0-9.]+ ([0-9]{3})([ \r\n]|$)", 1)
    location = F.regexp_extract(hdr, r"(?im)^Location:[ \t]*([^\r\n]+)", 1)
    mime = F.regexp_extract(hdr, r"(?im)^Content-Type:[ \t]*([^\r\n;]+)", 1)
    # the transport-layer encoding label, for kernels/charset sniffing
    # (WHATWG precedence step 2) — the mime column strips parameters
    charset = F.regexp_extract(
        hdr, r"(?im)^Content-Type:[^\r\n]*;[ \t]*charset=\"?'?([a-zA-Z0-9._-]+)", 1
    )
    return records.select(
        "url",
        F.when(status != "", status).cast("int").alias("status_code"),
        F.when(location != "", F.trim(location)).alias("location"),
        F.when(mime != "", F.trim(mime)).alias("mime"),
        F.when(charset != "", F.lower(charset)).alias("charset"),
    )


def redirect_map(fetches: DataFrame) -> DataFrame:
    """(url -> resolved next url) for rows that are followable
    redirects: 3xx status AND a non-empty Location, resolved against
    the request URL (Locations are often relative)."""
    followable = F.col("status_code").isin(list(REDIRECT_STATUSES)) & (
        F.trim(F.coalesce(F.col("location"), F.lit(""))) != ""
    )
    return fetches.filter(followable).select(
        F.col("url").alias("m_url"),
        resolve_reference_expr(F.col("url"), F.col("location")).alias("m_next"),
    )


def resolve_redirects(fetches: DataFrame, max_hops: int = MAX_HOPS) -> DataFrame:
    """Resolve every row of ``fetches`` (url, status_code, location) to
    its chain end: (url, final_url, n_hops, terminal).

    ``terminal``: 'final' (chain ended at a non-redirect URL — content
    or dangling), 'loop' (the next hop revisits a URL already walked;
    final_url is the last URL before the revisit), or 'max_hops' (still
    pointing at a redirect after ``max_hops`` hops). A row whose own
    status is not a followable redirect is 'final' with 0 hops.
    """
    m = redirect_map(fetches)

    # null-safe: NULL status_code (e.g. a non-HTTP payload through
    # http_response_meta) must land in the non-redirect branch, not
    # vanish from both filters as three-valued NULL would
    is_redirect = F.coalesce(
        F.col("status_code").isin(list(REDIRECT_STATUSES))
        & (F.trim(F.coalesce(F.col("location"), F.lit(""))) != ""),
        F.lit(False),
    )
    base = fetches.select("url", is_redirect.alias("is_redirect"))
    # non-redirect rows are terminal by inspection — they never join
    direct = base.filter(~F.col("is_redirect")).select(
        "url",
        F.col("url").alias("final_url"),
        F.lit(0).alias("n_hops"),
        F.lit(TERMINAL_FINAL).alias("terminal"),
    )
    walk = base.filter(F.col("is_redirect")).select(
        "url",
        F.col("url").alias("cur_url"),
        F.lit(0).alias("n_hops"),
        F.array(F.col("url")).alias("visited"),
        F.lit(False).alias("looped"),
    )
    for _ in range(max_hops):
        j = walk.join(m, walk["cur_url"] == m["m_url"], "left")
        advancing = (
            ~F.col("looped")
            & F.col("m_next").isNotNull()
            & ~F.array_contains(F.col("visited"), F.col("m_next"))
        )
        looping = (
            ~F.col("looped")
            & F.col("m_next").isNotNull()
            & F.array_contains(F.col("visited"), F.col("m_next"))
        )
        walk = j.select(
            "url",
            F.when(advancing, F.col("m_next"))
            .otherwise(F.col("cur_url"))
            .alias("cur_url"),
            F.when(advancing, F.col("n_hops") + 1)
            .otherwise(F.col("n_hops"))
            .alias("n_hops"),
            F.when(advancing, F.array_append(F.col("visited"), F.col("m_next")))
            .otherwise(F.col("visited"))
            .alias("visited"),
            (F.col("looped") | looping).alias("looped"),
        )
    # terminal label is decidable statelessly from the end state: a loop
    # flag wins; otherwise "still a redirect source" means the cap bit,
    # anything else is a genuine chain end
    ended = walk.join(
        m.select(F.col("m_url").alias("e_url")).distinct(),
        walk["cur_url"] == F.col("e_url"),
        "left",
    ).select(
        "url",
        F.col("cur_url").alias("final_url"),
        "n_hops",
        F.when(F.col("looped"), F.lit(TERMINAL_LOOP))
        .when(F.col("e_url").isNotNull(), F.lit(TERMINAL_MAX_HOPS))
        .otherwise(F.lit(TERMINAL_FINAL))
        .alias("terminal"),
    )
    return direct.unionByName(ended)
