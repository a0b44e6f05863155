"""Facade API (reference pathik/__init__.py surface): result-dict shape
parity with PathikFileResult (schema.py:43-66), R2 key shape
(crawler.py:508-578), Kafka producer wrapper (__init__.py:40-208)."""

from __future__ import annotations

import os

import pytest

import pathik_spark
from pathik_spark.sources import sinks


@pytest.fixture(scope="module")
def some_urls(corpus):
    rows = corpus["pages"].select("url").limit(3).collect()
    return [r["url"] for r in rows]


def test_crawl_result_dict_shape(spark, corpus, some_urls, tmp_path):
    urls = some_urls + [
        "notaurl",  # fails validation
        "https://host-missing.example.com/nowhere",  # valid but unfetchable
    ]
    out = pathik_spark.crawl(
        urls, output_dir=str(tmp_path), spark=spark, pages=corpus["pages"]
    )
    assert set(out) == set(urls)  # keyed by ORIGINAL input strings
    for u in some_urls:
        r = out[u]
        assert r["success"] is True and r["error"] is None
        assert os.path.isfile(r["html"]) and os.path.isfile(r["markdown"])
        assert r["html"].endswith(".html") and r["markdown"].endswith(".md")
        with open(r["html"], "rb") as f:
            assert len(f.read()) > 0
    assert out["notaurl"]["success"] is False
    assert out["notaurl"]["html"] is None
    assert "invalid" in out["notaurl"]["error"]
    missing = out["https://host-missing.example.com/nowhere"]
    assert missing["success"] is False and missing["error"].startswith("fetch failed")


def test_crawl_single_url_string_and_default_dir(spark, corpus, some_urls):
    out = pathik_spark.crawl(some_urls[0], spark=spark, pages=corpus["pages"])
    assert list(out) == [some_urls[0]]
    r = out[some_urls[0]]
    assert r["success"] and os.path.isfile(r["html"])


def test_crawl_rejects_empty_urls(spark, corpus):
    with pytest.raises(ValueError):
        pathik_spark.crawl([], spark=spark, pages=corpus["pages"])


def test_crawl_selector_and_selector_files(spark, corpus, some_urls, tmp_path):
    out = pathik_spark.crawl(
        some_urls[:1],
        output_dir=str(tmp_path),
        spark=spark,
        pages=corpus["pages"],
        selector="p",
        selector_files=True,
    )
    r = out[some_urls[0]]
    assert r["success"]
    assert isinstance(r["selected"], str) and len(r["selected"]) > 0
    assert r["selected_file"].endswith(".selected.txt")
    with open(r["selected_file"], encoding="utf-8") as f:
        assert f.read() == r["selected"]


def test_crawl_to_r2_key_shape(spark, corpus, some_urls, tmp_path):
    out = pathik_spark.crawl_to_r2(
        some_urls[:2],
        uuid_str="fixed-uuid",
        spark=spark,
        pages=corpus["pages"],
        output_dir=str(tmp_path),
    )
    for u in some_urls[:2]:
        r = out[u]
        assert r["success"]
        assert r["uuid"] == "fixed-uuid"
        # storage.go:129-131 key format: {uuid}+{sanitized}.{ext}
        assert r["r2_html_key"].startswith("fixed-uuid+")
        assert r["r2_html_key"].endswith(".html")
        assert r["r2_markdown_key"].endswith(".md")
        assert os.path.isfile(r["local_html_file"])


def test_crawl_to_r2_deterministic_uuid_replays(spark, corpus, some_urls):
    a = pathik_spark.crawl_to_r2(some_urls[:1], spark=spark, pages=corpus["pages"])
    b = pathik_spark.crawl_to_r2(some_urls[:1], spark=spark, pages=corpus["pages"])
    u = some_urls[0]
    assert a[u]["r2_html_key"] == b[u]["r2_html_key"]


def test_stream_to_kafka_table_fallback(spark, corpus, some_urls, tmp_path):
    table = str(tmp_path / "kafka_out")
    out = pathik_spark.stream_to_kafka(
        some_urls + ["notaurl"],
        content_type="both",
        session="sess12345",
        spark=spark,
        pages=corpus["pages"],
        output_table=table,
    )
    for u in some_urls:
        assert out[u]["success"]
        assert out[u]["details"]["topic"] == "pathik_crawl_data"
        assert out[u]["details"]["session"] == "sess12345"
    assert out["notaurl"]["success"] is False
    msgs = spark.read.parquet(table)
    assert {"key", "value", "headers"} <= set(msgs.columns)
    # both => one html + one md message per fetched url
    assert msgs.count() == 2 * len(some_urls)


def test_stream_to_kafka_rejects_bad_content_type(spark, corpus, some_urls):
    with pytest.raises(ValueError):
        pathik_spark.stream_to_kafka(
            some_urls[:1], content_type="pdf", spark=spark, pages=corpus["pages"]
        )


def test_kafka_writer_options_auth_matrix():
    plain = sinks.kafka_writer_options("b:9092", "t")
    assert plain == {"kafka.bootstrap.servers": "b:9092", "topic": "t"}
    sasl = sinks.kafka_writer_options(
        "b:9092", "t", username="u", password="p", use_tls=True,
        compression_type="gzip", max_message_size=1048576, buffer_memory=1024,
    )
    assert sasl["kafka.security.protocol"] == "SASL_SSL"
    assert sasl["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="u"' in sasl["kafka.sasl.jaas.config"]
    assert sasl["kafka.compression.type"] == "gzip"
    assert sasl["kafka.max.request.size"] == "1048576"
    no_auth_tls = sinks.kafka_writer_options("b:9092", "t", use_tls=True)
    assert no_auth_tls["kafka.security.protocol"] == "SSL"
    with pytest.raises(ValueError):
        sinks.kafka_writer_options("b:9092", "t", compression_type="zip")


def test_crawl_to_warc_archives_and_indexes(spark, corpus, some_urls, tmp_path):
    from pathik_spark.sources.sinks import read_warc_record

    urls = some_urls + ["https://host-missing.example.com/nowhere"]
    out = pathik_spark.crawl_to_warc(
        urls, str(tmp_path / "warc"), spark=spark, pages=corpus["pages"]
    )
    assert set(out) == set(urls)
    golden = {
        r["url"]: bytes(r["html"])
        for r in corpus["pages"].select("url", "html").collect()
    }
    for u in some_urls:
        r = out[u]
        assert r["success"] is True
        headers, payload = read_warc_record(r["path"], r["offset"], r["length"])
        assert "WARC/1.0" in headers
        # archived payload is the fetched page byte-for-byte
        assert payload == golden[u]
    assert out["https://host-missing.example.com/nowhere"]["success"] is False


def test_dedup_corpus_methods_agree_on_exact_dup(spark):
    import pathik_spark

    filler_a = " ".join(f"alpha w{i % 17} tok{i % 5}" for i in range(40))
    filler_b = " ".join(f"beta q{i % 13} item{i % 7}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, filler_a), (2, filler_a), (3, filler_b)], ["doc_id", "text"]
    )
    for method in ("exact", "minhash", "simhash", "cdc"):
        kept, clusters = pathik_spark.dedup_corpus(docs, method=method)
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == {1, 3}, method          # lowest-id canonical survives
        lab = {r["doc_id"]: r for r in clusters.collect()}
        assert lab[1]["is_canonical"] and not lab[2]["is_canonical"], method


def test_dedup_corpus_semantic_and_bad_method(spark):
    import pathik_spark
    import pytest as _pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 60"
    ).withColumnRenamed("vec_id", "doc_id")
    kept, clusters = pathik_spark.dedup_corpus(
        emb, method="semantic", threshold=0.99
    )
    assert kept.count() <= 60 and kept.count() > 0
    with _pytest.raises(ValueError):
        pathik_spark.dedup_corpus(emb, method="nope")


def test_dedup_corpus_canonical_method(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://h/a",
                html='<head><link rel="canonical" href="https://h/a"></head>'),
            Row(doc_id=2, url="https://h/a?utm=x",
                html='<head><link rel="canonical" href="https://h/a"></head>'),
            Row(doc_id=3, url="https://h/b", html="<head></head>"),
        ],
        "doc_id long, url string, html string",
    )
    kept, clusters = pathik_spark.dedup_corpus(docs, method="canonical")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    labeled = {r["doc_id"]: r for r in clusters.collect()}
    assert labeled[1]["cluster_id"] == labeled[2]["cluster_id"] == "https://h/a"
    assert labeled[1]["is_canonical"] and not labeled[2]["is_canonical"]
    assert labeled[1]["cluster_size"] == 2
    assert labeled[3]["is_canonical"] and labeled[3]["cluster_size"] == 1
