"""Host-blocklist and URL-keyword filtering (UT1 / C4-style).

Production webtext pipelines drop URLs before fetching them: a curated
host blocklist (UT1 categories, spam/ad/tracker domains) with
SUBDOMAIN semantics — blocking ``tracker.example`` must also block
``cdn.tracker.example`` — plus cheap keyword rules on the URL string
(C4 drops URLs containing "bad words").

Scale shape: the blocklist (10^4-10^6 hosts) is tiny next to the
frontier (10^10 URLs), so the match must never shuffle the frontier.
``host_blocklist_filter`` checks each dot-suffix of the host (depth is
bounded — hosts have ~2-6 labels) with one BROADCAST left join per
suffix level, all stages scan-local: no exchange on the frontier side,
no explode fan-out, no groupBy to reassemble. ``url_keyword_filter``
is a pure expression (OR of substring tests) — free inside whatever
scan already reads the URL column.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.urls import hostname_of

MAX_SUFFIX_LEVELS = 5  # check the last 2..5 labels (plus the exact host)


def _suffix(labels_col, k: int):
    """Last-k-labels dot-suffix of the host, null when the host is
    shorter than k labels (no match possible)."""
    return F.when(
        F.size(labels_col) >= k,
        F.array_join(F.slice(labels_col, -k, k), "."),
    )


def host_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    max_levels: int = MAX_SUFFIX_LEVELS,
    keep_blocked: bool = False,
) -> DataFrame:
    """Filter rows whose URL host — or any parent domain of it — is on
    the blocklist.

    ``blocklist`` needs a ``host`` column (lowercase registrable domain
    or exact host). Returns the input columns plus ``blocked_host``
    (the matching blocklist entry, null if clean); rows with a match
    are dropped unless ``keep_blocked`` (diagnostics mode returns
    everything, verdict attached).

    One broadcast left join per suffix level k=2..max_levels plus one
    for the exact host; a host deeper than ``max_levels`` labels still
    blocks on exact match and on its last-``max_levels`` suffixes.
    """
    bl = blocklist.select(F.lower(F.col("host")).alias("host")).distinct()
    host = F.lower(hostname_of(F.col(url_col)))
    out = df.withColumn("_bl_host", host).withColumn(
        "_bl_labels", F.split(host, r"\.")
    )
    match_cols = []
    # exact host first (covers depth > max_levels), then shallow->deep
    keys = [F.col("_bl_host")] + [
        _suffix(F.col("_bl_labels"), k) for k in range(2, max_levels + 1)
    ]
    for i, key in enumerate(keys):
        alias = f"_bl_m{i}"
        side = F.broadcast(bl.select(F.col("host").alias(alias)))
        out = out.withColumn(f"_bl_k{i}", key).join(
            side, F.col(f"_bl_k{i}") == F.col(alias), "left"
        )
        match_cols.append(F.col(alias))
    verdict = F.coalesce(*match_cols) if len(match_cols) > 1 else match_cols[0]
    out = out.withColumn("blocked_host", verdict).drop(
        "_bl_host", "_bl_labels", *[f"_bl_k{i}" for i in range(len(keys))],
        *[f"_bl_m{i}" for i in range(len(keys))],
    )
    if keep_blocked:
        return out
    return out.filter(F.col("blocked_host").isNull()).drop("blocked_host")


def url_keyword_filter(
    df: DataFrame,
    keywords: Iterable[str],
    url_col: str = "url",
    keep_blocked: bool = False,
) -> DataFrame:
    """C4-style URL keyword rule: drop rows whose lowercased URL
    contains any of ``keywords`` (plain substrings, not regex — the
    blocklists ship as word lists). Pure expression, scan-local."""
    kws = [k.lower() for k in keywords]
    if not kws:
        raise ValueError("keywords must be non-empty")
    lowered = F.lower(F.col(url_col))
    hit = None
    for k in kws:
        h = lowered.contains(k)
        hit = h if hit is None else (hit | h)
    out = df.withColumn("url_blocked", hit)
    if keep_blocked:
        return out
    return out.filter(~F.col("url_blocked")).drop("url_blocked")
