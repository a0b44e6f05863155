"""Sink projections (S4-S8) + config validation + streaming smoke."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pathik_spark.config import CrawlConfig
from pathik_spark.plans.driver import CrawlRun
from pathik_spark.sources import sinks as S


@pytest.fixture(scope="module")
def artifacts(spark, corpus, tmp_path_factory):
    run = CrawlRun(
        spark,
        pages=corpus["pages"],
        robots=corpus["robots"],
        links=None,
        state_dir=str(tmp_path_factory.mktemp("sink_state")),
        config=CrawlConfig(run_id="sinks"),
    )
    run.run(corpus["seeds"], n_rounds=1)
    arts = run.store.read_table(0, "artifacts")
    # re-attach html (driver drops it from the snapshot to keep it lean)
    from pathik_spark.functions.urls import canonicalize_udf, url_hash_expr

    pages = corpus["pages"].select(
        url_hash_expr(canonicalize_udf(F.col("url"))).alias("url_hash"), "html"
    )
    return arts.join(pages, "url_hash", "left").cache()


def test_local_file_rows(spark, artifacts):
    out = S.local_file_rows(artifacts).cache()
    rows = out.limit(20).collect()
    assert rows
    for r in rows:
        assert r["filename"].endswith((".html", ".md"))
        assert r["content"] is not None
    n_fetched = artifacts.filter(F.col("status") == "fetched").count()
    assert out.count() == 2 * n_fetched  # html + md per url


def test_r2_rows_key_format(spark, artifacts):
    out = S.r2_object_rows(artifacts, run_id="sinks").limit(10).collect()
    for r in out:
        assert "+" in r["key"] and r["key"].endswith((".html", ".md"))
        assert r["mime"] in ("text/html", "text/markdown")


def test_kafka_rows_shape_and_filters(spark, artifacts):
    msgs = S.kafka_message_rows(artifacts, content_type="both", session_id="sess-1").cache()
    n_fetched = artifacts.filter(F.col("status") == "fetched").count()
    assert msgs.count() == 2 * n_fetched
    html_only = S.filter_kafka_rows(msgs, content_type_substr="text/html")
    assert html_only.count() == n_fetched
    sess = S.filter_kafka_rows(msgs, session_id="sess-1")
    assert sess.count() == 2 * n_fetched
    none_sess = S.filter_kafka_rows(msgs, session_id="other")
    assert none_sess.count() == 0
    row = msgs.limit(1).collect()[0]
    header_keys = [h["key"] for h in row["headers"]]
    assert header_keys == ["url", "timestamp", "sessionID", "contentType"]


@pytest.mark.skipif(
    not os.environ.get("PATHIK_KAFKA_BROKERS"),
    reason="live-broker smoke: set PATHIK_KAFKA_BROKERS to run "
    "(needs a reachable Kafka broker and the spark-sql-kafka connector "
    "jar on the session classpath)",
)
def test_live_kafka_roundtrip(spark, artifacts):
    """Env-gated live-broker smoke (reference behavior:
    /root/reference/test_secure_kafka.py publish + consume,
    examples/kafka_consumer.py:179-196 header filters): produce
    kafka_message_rows via write_kafka_batch against a real broker,
    read the topic back with Spark's Kafka source, and check key/value/
    header round-trip. Skipped wherever no broker exists (this sandbox);
    auth follows the same env surface the reference's clients use."""
    import uuid

    brokers = os.environ["PATHIK_KAFKA_BROKERS"]
    topic = f"pathik-smoke-{uuid.uuid4().hex[:12]}"
    opts = S.kafka_writer_options(
        brokers,
        topic,
        username=os.environ.get("PATHIK_KAFKA_USERNAME"),
        password=os.environ.get("PATHIK_KAFKA_PASSWORD"),
        use_tls=os.environ.get("PATHIK_KAFKA_TLS", "") == "1",
        client_id="pathik-smoke",
    )
    msgs = S.kafka_message_rows(
        artifacts, content_type="html", session_id="smoke-1"
    ).limit(20).cache()
    sent = msgs.count()
    assert sent > 0
    S.write_kafka_batch(msgs, opts)

    read_opts = {
        k: v for k, v in opts.items() if k != "topic" and k != "kafka.client.id"
    }
    got = (
        spark.read.format("kafka")
        .options(**read_opts)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("includeHeaders", "true")
        .load()
    )
    assert got.count() == sent
    want_keys = {r["key"] for r in msgs.select("key").collect()}
    got_keys = {bytes(r["key"]) for r in got.select("key").collect()}
    assert {bytes(k) for k in want_keys} == got_keys
    # headers survive the broker round-trip in order
    row = got.limit(1).collect()[0]
    assert [h["key"] for h in row["headers"]] == [
        "url", "timestamp", "sessionID", "contentType"
    ]


def test_config_validation():
    CrawlConfig(session_id="ok_session-1.2").validate()
    with pytest.raises(ValueError):
        CrawlConfig(session_id="bad session!").validate()
    with pytest.raises(ValueError):
        CrawlConfig(content_type="xml").validate()
    with pytest.raises(ValueError):
        CrawlConfig(limit_per_round=0).validate()
    with pytest.raises(ValueError):
        CrawlConfig(kafka_compression="brotli").validate()


def test_streaming_smoke(spark, corpus, tmp_path):
    # file-source streaming over kafka-shaped/pages rows with memory sink
    from pathik_spark.streaming.kafka_shaped import streaming_host_metrics

    pages_dir = str(tmp_path / "pages_stream")
    corpus["pages"].write.mode("overwrite").parquet(pages_dir)
    schema = corpus["pages"].schema
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    agg = streaming_host_metrics(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hm_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM hm_stream")
        assert out.count() > 0
        total = out.agg(F.sum("n_pages")).collect()[0][0]
        assert total == corpus["pages"].count()
    finally:
        q.stop()


def test_write_training_jsonl_split_layout(spark, tmp_path):
    import glob
    import gzip
    import json as _json

    from pathik_spark.sources.sinks import write_training_jsonl

    corpus = spark.createDataFrame(
        [(1, "alpha text", "train"), (2, "beta text", "val"), (3, "gamma text", "train")],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "jsonl")
    write_training_jsonl(corpus, out)
    files = sorted(glob.glob(f"{out}/split=*/part-*.json.gz"))
    assert files and all("/split=" in f for f in files)
    rows = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            rows += [(_json.loads(line), f) for line in fh if line.strip()]
    got = {r["doc_id"]: (r["text"], "split=train" in f) for r, f in rows}
    assert got == {1: ("alpha text", True), 2: ("beta text", False), 3: ("gamma text", True)}
    # round-trips through spark's own reader with the split restored
    back = spark.read.json(out)
    assert back.count() == 3 and set(back.columns) == {"doc_id", "text", "split"}


def test_write_sharded_jsonl_layout_and_balance(spark, tmp_path):
    import glob
    import gzip
    import json

    from pathik_spark.sources.sinks import write_sharded_jsonl

    rows = [(i, "x" * (50 + (i * 37) % 400)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    manifest = write_sharded_jsonl(
        df, out, target_shard_bytes=20_000, compression="none"
    )
    stats = {r["shard"]: r for r in manifest.collect()}
    dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(dirs) == len(stats) and len(dirs) > 2
    # exactly ONE part file per shard, readable round-trip
    seen = {}
    for d in dirs:
        parts = [p for p in glob.glob(f"{d}/part-*") if not p.endswith(".crc")]
        assert len(parts) == 1
        for line in open(parts[0]):
            rec = json.loads(line)
            seen[rec["doc_id"]] = rec["text"]
    assert seen == {i: t for i, t in rows}
    # statistical balance: no shard more than 3x the mean at this tiny scale
    sizes = [r["shard_bytes"] for r in stats.values()]
    assert max(sizes) < 3 * (sum(sizes) / len(sizes))
    # deterministic membership on re-run
    manifest2 = write_sharded_jsonl(
        df.repartition(7), out, target_shard_bytes=20_000, compression="none"
    )
    assert sorted(map(tuple, manifest2.collect())) == sorted(
        map(tuple, manifest.collect())
    )


@pytest.mark.skipif(
    not os.environ.get("PATHIK_S3_ENDPOINT"),
    reason="live object-store smoke: set PATHIK_S3_ENDPOINT (any "
    "S3-compatible endpoint — MinIO counts), PATHIK_S3_BUCKET, "
    "PATHIK_S3_ACCESS_KEY, PATHIK_S3_SECRET_KEY to run (also needs "
    "hadoop-aws + aws-sdk jars on the session classpath, e.g. "
    "spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop ver>)",
)
def test_live_s3_object_roundtrip(spark, artifacts):
    """Env-gated live object-store smoke (mirror of the Kafka one;
    reference behavior: storage.go:122-147 PUTs url-keyed objects):
    write_r2_objects against a real s3a:// destination, read the
    prefix back, and check key/mime/content round-trip. Skipped
    wherever no endpoint exists (this sandbox). Against real
    Cloudflare R2, build the conf with r2_hadoop_conf(account_id, ...)
    instead of the raw endpoint below."""
    import uuid

    endpoint = os.environ["PATHIK_S3_ENDPOINT"]
    bucket = os.environ["PATHIK_S3_BUCKET"]
    conf = {
        "fs.s3a.endpoint": endpoint,
        "fs.s3a.access.key": os.environ["PATHIK_S3_ACCESS_KEY"],
        "fs.s3a.secret.key": os.environ["PATHIK_S3_SECRET_KEY"],
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.ssl.enabled": (
            "false" if endpoint.startswith("http://") else "true"
        ),
        "fs.s3a.committer.name": "magic",
    }
    objs = S.r2_object_rows(artifacts, run_id="s3smoke").limit(20).cache()
    sent = objs.count()
    assert sent > 0
    dest = f"s3a://{bucket}/pathik-smoke-{uuid.uuid4().hex[:12]}"
    S.write_r2_objects(objs, dest, hadoop_conf=conf)

    got = spark.read.parquet(dest)
    assert got.count() == sent
    want_rows = {r["key"]: r for r in objs.collect()}
    for r in got.collect():
        w = want_rows[r["key"]]
        assert r["mime"] == w["mime"]
        assert r["content"] == w["content"]
