"""Streaming corpus cleaning (streaming/clean_stream.py): same gate
verdicts as the batch operators, cross-micro-batch content dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathik_spark.streaming.clean_stream import DOC_STREAM_SCHEMA, clean_documents_stream

GOOD = (
    "This is a perfectly reasonable English paragraph with enough words here.\n"
    "It has several sentences that end with terminal punctuation marks.\n"
    "The quick brown fox jumps over the lazy dog near the river bank.\n"
    "Every line in this document is long enough to pass the filters.\n"
    "The final line also ends with a proper full stop, as required."
)
GIBBERISH = "zxqv wub frag blorp\nqqq www eee rrr ttt\nnope"


def _write_batch(spark, path, rows, mode="append"):
    df = spark.createDataFrame(rows, DOC_STREAM_SCHEMA.replace("timestamp", "string"))
    df.withColumn("event_ts", F.to_timestamp("event_ts")).write.mode(mode).parquet(path)


def test_clean_stream_gates_and_cross_batch_dedup(spark, tmp_path):
    path = str(tmp_path / "docs_src")
    _write_batch(
        spark,
        path,
        [
            ("d1", GOOD, "2025-03-01 00:00:01"),
            ("d2", GIBBERISH, "2025-03-01 00:00:02"),
            ("d3", GOOD, "2025-03-01 00:00:03"),  # in-batch duplicate of d1
        ],
        mode="overwrite",
    )
    schema = DOC_STREAM_SCHEMA
    stream = spark.readStream.schema(schema).parquet(path)
    out = clean_documents_stream(stream, langs=("en",), min_quality=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("clean_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM clean_stream").collect()}
        assert "d2" not in kept          # gibberish gated
        assert len(kept & {"d1", "d3"}) == 1  # exact dup collapsed in-batch

        # a SECOND micro-batch re-sends the same content: state store
        # remembers the hash across batches
        _write_batch(spark, path, [("d9", GOOD, "2025-03-01 00:01:00")])
        q.processAllAvailable()
        kept2 = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM clean_stream").collect()}
        assert "d9" not in kept2 and kept2 == kept
    finally:
        q.stop()


def test_clean_stream_matches_batch_gates(spark, tmp_path):
    """A doc admitted by the stream == a doc the batch gates keep."""
    from pathik_spark.functions.text import lang_id, quality_score
    from pathik_spark.operators.linedup import c4_clean

    rows = [
        ("a", GOOD, "2025-03-01 00:00:01"),
        ("b", GIBBERISH, "2025-03-01 00:00:02"),
        ("c", "Short.", "2025-03-01 00:00:03"),
        ("d", GOOD + "\nOne more good English sentence ends here too.", "2025-03-01 00:00:04"),
    ]
    path = str(tmp_path / "src2")
    _write_batch(spark, path, rows, mode="overwrite")

    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(path)
    q = (
        clean_documents_stream(stream, langs=("en",), min_quality=0.3)
        .writeStream.format("memory")
        .queryName("clean_stream_eq")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM clean_stream_eq").collect()}
    finally:
        q.stop()

    batch = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id string, text string"
    )
    b = c4_clean(batch).filter(F.col("keep")).select("doc_id", "text")
    b = (
        b.withColumn("lang_guess", lang_id(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("lang_guess").isin("en") & (F.col("quality") >= 0.3))
    )
    assert streamed == {r["doc_id"] for r in b.collect()}


def test_clean_stream_soft404_gate(spark, tmp_path):
    path = str(tmp_path / "docs404")
    err = "Error 404 - Page Not Found. " + GOOD
    _write_batch(
        spark,
        path,
        [
            ("ok", GOOD, "2025-03-01 00:00:01"),
            ("soft", err, "2025-03-01 00:00:02"),
        ],
        mode="overwrite",
    )
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(path)
    out = clean_documents_stream(stream, langs=("en",), min_quality=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("clean_stream_404")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {
            r["doc_id"]
            for r in spark.sql("SELECT doc_id FROM clean_stream_404").collect()
        }
        assert kept == {"ok"}
    finally:
        q.stop()
