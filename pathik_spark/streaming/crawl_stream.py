"""Continuous-crawl facade: the batch round loop's semantics re-expressed
as ONE Structured Streaming pipeline (SURVEY.md streaming surface; the
operational shape when discovered URLs arrive continuously instead of
in rounds).

    frontier parquet dir (appended by discoverers)          [file source]
      -> validate (F1) + canonicalize + hash   [pure expressions, B1]
      -> robots stream-static broadcast join + disallow filter [J4/B3]
      -> URL-seen dedup: dropDuplicates(url_hash)     [state store, J3]
      -> per-host lifetime budget: applyInPandasWithState      [B4/W2]
      -> foreachBatch: fetch join vs the static pages table +
         byte-identical extraction -> append artifacts        [J2/X5]

Scale notes: everything before foreachBatch is stateless expression or
state-store-backed (the seen state is keyed by the 8-byte url_hash —
the streaming twin of the bloom/cuckoo-sharded batch anti-join; with a
watermark the dedup uses dropDuplicatesWithinWatermark so seen keys are
EVICTED past the delay — bounded state; without one it is exact
lifetime dedup with state growing in distinct URLs). The micro-batch
body reuses the SAME batch operators (fetch_join, extract_artifacts),
so streaming and batch crawl artifacts are byte-identical for the same
admitted URLs — asserted in tests/test_crawl_stream.py. Idempotent
replay: foreachBatch is at-least-once, so artifacts are written via
dynamic overwrite of the batch_id partition — a re-run batch replaces
its own partition; re-running with the same checkpoint fetches nothing
twice (the resume test).

Reference parity: the reference's long-running crawler daemon
(crawler.go loop) maps to this always-on stream; its per-host limiter
maps to the stateful budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathik_spark import functions as _  # noqa: F401  (package import order)
from pathik_spark.functions import urls as U
from pathik_spark.operators.fetch import extract_artifacts, fetch_join, pages_by_hash
from pathik_spark.operators.robots import filter_disallowed
from pathik_spark.streaming.stateful import stateful_host_budget

FRONTIER_STREAM_SCHEMA = (
    "url string, seq long, priority int, event_ts timestamp"
)


def prepare_frontier_stream(
    stream: DataFrame,
    num_shards: int = 4096,
    watermark: str | None = None,
) -> DataFrame:
    """The streaming twin of operators/frontier.prepare_frontier minus
    the groupBy (first-occurrence collapse becomes the state-store
    dropDuplicates): validate cheap-first, canonicalize, hash, dedup."""
    out = (
        stream.filter(U.is_valid_url_expr(F.col("url")))
        .withColumn("url_raw", F.col("url"))
        .withColumn("url", U.canonical_col(F.col("url")))
        .filter(F.col("url").isNotNull())
        .withColumn("host", U.hostname_of(F.col("url")))
        .withColumn("url_hash", U.url_hash_expr(F.col("url")))
        .withColumn("host_hash", U.host_hash_expr(F.col("host"), num_shards))
    )
    if watermark is not None:
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: plain
        # dropDuplicates only evicts state when the event-time column is
        # part of the dedup subset, so keying on url_hash alone would grow
        # the state store by one entry per distinct URL forever. The
        # within-watermark variant evicts keys past the delay — the
        # streaming twin of the batch TTL re-crawl window (seen.py).
        return out.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
            ["url_hash"]
        )
    # no watermark: exact lifetime dedup, state grows with distinct URLs
    return out.dropDuplicates(["url_hash"])


def artifact_batch_writer(prepared_pages: DataFrame, out_dir: str, content_type: str):
    """The foreachBatch body: fetch join + extraction, landed as ONE
    batch_id partition. foreachBatch is at-least-once — a batch whose
    files landed but whose checkpoint commit did not is re-run with the
    same batch_id — so the write is a dynamic overwrite of that
    partition: the replay replaces the orphaned attempt's files instead
    of appending duplicates (idempotent; asserted in
    tests/test_crawl_stream.py)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        arts = extract_artifacts(
            fetch_join(batch_df, prepared_pages, prepared=True),
            with_markdown=content_type in ("markdown", "both"),
        ).withColumn("batch_id", F.lit(batch_id))
        (
            arts.drop("html")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return process_batch


def streaming_crawl(
    spark: SparkSession,
    frontier_dir: str,
    pages: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    robots: DataFrame | None = None,
    max_per_host: int = 10,
    num_shards: int = 4096,
    watermark: str | None = None,
    content_type: str = "both",
    available_now: bool = True,
):
    """Start (and by default drain) the continuous crawl. Returns the
    StreamingQuery; with ``available_now`` the call blocks until the
    current frontier backlog is fully processed — the batch-equivalent
    semantics the tests assert against.

    ``pages`` is the static corpus side (stream-static join happens
    inside foreachBatch against the pre-projected pages_by_hash shape,
    computed once here, not per batch)."""
    stream = spark.readStream.schema(FRONTIER_STREAM_SCHEMA).parquet(frontier_dir)
    prepped = prepare_frontier_stream(stream, num_shards, watermark)
    if robots is not None:
        has_allow = "allow_prefixes" in robots.columns
        rules = robots.select(
            "host",
            "disallow_prefixes",
            *(["allow_prefixes"] if has_allow else []),
        )
        joined = prepped.join(F.broadcast(rules), "host", "left").withColumn(
            "disallow_prefixes",
            F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
        )
        if has_allow:
            joined = joined.withColumn(
                "allow_prefixes",
                F.coalesce(F.col("allow_prefixes"), F.array().cast("array<string>")),
            )
        prepped = filter_disallowed(joined)
    admitted = stateful_host_budget(prepped, max_per_host=max_per_host)

    prepared_pages = pages_by_hash(pages)
    process_batch = artifact_batch_writer(prepared_pages, out_dir, content_type)

    writer = (
        admitted.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
