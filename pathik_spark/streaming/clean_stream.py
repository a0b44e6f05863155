"""Streaming corpus cleaning: the batch quality gates re-expressed over
a document stream (the shape when extracted pages arrive continuously
from the crawl stream instead of as a finished corpus).

    documents parquet dir (appended by extractors)        [file source]
      -> soft-404 gate              [pure expressions — soft404_signals]\n      -> C4 line/doc gates          [pure expressions — c4_clean]
      -> language + quality gates   [pure expressions — lang_id/quality]
      -> exact-content dedup: dropDuplicates(content_hash) [state store]

Everything before the dedup is stateless expression work, so it runs
inside the micro-batch scan with no state; the dedup is keyed by the
sha2-256 content hash — state holds hashes, never text (the streaming
twin of operators/dedup.exact_dedup's groupBy). With a watermark the state is EVICTED past the delay
(dropDuplicatesWithinWatermark — bounded state, the 100 TB/day shape);
without one it is exact lifetime dedup with state growing in distinct
contents.

Gate semantics are THE SAME EXPRESSIONS as the batch operators — a doc
admitted by the stream is exactly a doc the batch pipeline would keep
(asserted against the batch arm in tests/test_clean_stream.py), so a
corpus can move between batch and streaming ingestion without changing
what survives. Cross-batch stateful operators that need corpus-wide
aggregation (line dedup's occurrence counts, MinHash near-dup, LM
gating) stay batch-side by design: their state is corpus-sized, not
key-sized — run them as periodic compactions over the stream's output
(the same split the crawl driver makes for seen-set compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pathik_spark.functions.text import lang_id, quality_score
from pathik_spark.operators.dedup import normalized_text
from pathik_spark.operators.linedup import c4_clean

DOC_STREAM_SCHEMA = "doc_id string, text string, event_ts timestamp"


def clean_documents_stream(
    doc_stream: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    apply_c4: bool = True,
    drop_soft404: bool = True,
    dedup_within: str | None = None,
    event_ts_col: str = "event_ts",
) -> DataFrame:
    """Streaming DF of admitted documents: (doc_id, text, lang_guess,
    quality, content_hash, event_ts).

    ``dedup_within`` (e.g. ``"10 minutes"``): watermarked
    dropDuplicatesWithinWatermark on the content hash — bounded state;
    None: exact lifetime dedup (state grows with distinct contents).
    """
    cleaned = doc_stream
    if drop_soft404:
        # same stateless head-window expressions as the batch facade's
        # gate 0 (quality.filter_soft404s) — stream<->batch parity holds
        from pathik_spark.operators.quality import filter_soft404s

        cleaned = filter_soft404s(cleaned)
    if apply_c4:
        cleaned = (
            c4_clean(cleaned, passthrough=(event_ts_col,))
            .filter(F.col("keep"))
            .select("doc_id", "text", event_ts_col)
        )
    gated = (
        cleaned.withColumn("lang_guess", lang_id(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .filter(
            F.col("lang_guess").isin(*langs)
            & (F.col("quality") >= F.lit(min_quality))
        )
        # the SAME normalized-content hash batch exact_dedup keys on
        # (operators/dedup.py) — case/whitespace variants collapse in
        # both arms, keeping batch<->stream corpora interchangeable
        .withColumn("content_hash", F.md5(normalized_text(F.col("text"))))
        # fixed output schema regardless of apply_c4 (extra input
        # columns must not leak through one arm and not the other)
        .select(
            "doc_id", "text", "lang_guess", "quality", "content_hash",
            event_ts_col,
        )
    )
    if dedup_within is not None:
        return gated.withWatermark(event_ts_col, dedup_within) \
            .dropDuplicatesWithinWatermark(["content_hash"])
    return gated.dropDuplicates(["content_hash"])
