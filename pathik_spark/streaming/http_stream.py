"""Streaming twin of the HTTP-layer analysis (api.analyze_http_responses)
for response records arriving continuously — fresh WARC `response`
captures landing as files, or fetch results flowing off the crawl
stream.

Everything here is STATELESS expression work (header parsing, cache
metadata, per-URL TTLs), so it runs inside the micro-batch scan with no
state store and the gate semantics are THE SAME EXPRESSIONS as the
batch operators — asserted batch==stream in tests/test_http_stream.py.

The two aggregating members of the family stay out of the per-record
stream by design, same split the corpus cleaner makes:

- ``retry_after_delays`` (per-host MAX) runs per micro-batch inside
  ``foreachBatch`` where the batch operator applies unchanged — each
  batch's demands overlay the scheduler's delay table for the NEXT
  round (backoff is a control signal, not an accumulating fact:
  the latest server demand supersedes, it doesn't sum);
- ``resolve_redirects`` needs self-joins over the full redirect map
  (stream-stream joins of unbounded scope); chains resolve batch-side
  over the landed table, exactly like seen-set compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pathik_spark.operators.redirects import http_response_meta
from pathik_spark.operators.revalidate import cache_ttl_hours, http_cache_meta

#: the input contract (WARC-shaped response records).
RESPONSE_STREAM_SCHEMA = "url string, warc_ts timestamp, html binary"


def http_meta_stream(records: DataFrame) -> DataFrame:
    """Streaming (url, status_code, location, mime, charset): the
    redirect/meta parse as a stateless streaming projection."""
    return http_response_meta(records)


def cache_ttl_stream(records: DataFrame, **ttl_kwargs) -> DataFrame:
    """Streaming (url, ttl_hours, ttl_source): cache-declared recrawl
    TTLs per arriving capture — the per-URL overlay feed for
    delta.recrawl_filter_adaptive's ``url_ttls``."""
    return cache_ttl_hours(http_cache_meta(records), **ttl_kwargs)


def make_retry_after_batch_processor(on_delays):
    """foreachBatch processor: per micro-batch, compute the per-host
    Retry-After demands with the UNCHANGED batch operator and hand the
    (host, crawl_delay_ms) table to ``on_delays(df, batch_id)`` —
    typically robots.apply_delay_overrides into the next round's
    politeness table."""
    from pathik_spark.operators.revalidate import retry_after_delays

    def process(batch_df: DataFrame, batch_id: int) -> None:
        on_delays(retry_after_delays(batch_df), batch_id)

    return process
