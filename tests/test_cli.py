"""CLI (reference pathik/cli.py:266-359 surface): flag parity, JSON
result output, parity-flag notices, R2/S3A conf assembly."""

from __future__ import annotations

import json

import pytest

from pathik_spark.cli import build_parser, main
from pathik_spark.sources.sinks import r2_hadoop_conf, r2_object_rows, write_r2_objects


@pytest.fixture(scope="module")
def pages_path(corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "pages.parquet")
    corpus["pages"].write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def some_urls(corpus):
    return [r["url"] for r in corpus["pages"].select("url").limit(2).collect()]


def test_parser_accepts_reference_flag_surface():
    p = build_parser()
    a = p.parse_args(
        ["crawl", "https://x.com/", "-o", "/tmp/o", "-p", "-s", "p.lead", "-sf",
         "-w", "8", "-t", "30", "-l", "10", "-v", "-k", "-d", "100",
         "--session-id", "s123456", "--pages", "/tmp/pages"]
    )
    assert a.command == "crawl" and a.selector == "p.lead" and a.limit == 10
    k = p.parse_args(
        ["kafka", "https://x.com/", "--pages", "/tmp/pages", "--content-type", "html",
         "--kafka-brokers", "b:9092", "--kafka-username", "u", "--kafka-use-tls",
         "--compression", "gzip", "--max-message-size", "1000"]
    )
    assert k.compression == "gzip" and k.kafka_use_tls is True
    r = p.parse_args(
        ["r2", "https://x.com/", "--pages", "/tmp/pages", "--uuid", "u1",
         "--r2-account-id", "acc", "--r2-bucket-name", "b"]
    )
    assert r.uuid_str == "u1" and r.r2_account_id == "acc"


def test_cli_crawl_end_to_end(spark, pages_path, some_urls, tmp_path, capsys):
    rc = main(
        ["crawl", *some_urls, "-o", str(tmp_path), "--pages", pages_path,
         "--master", "local[4]"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == set(some_urls)
    assert all(r["success"] for r in out.values())


def test_cli_limit_and_failure_exit_code(spark, pages_path, some_urls, tmp_path, capsys):
    rc = main(
        ["crawl", some_urls[0], "notaurl", "-o", str(tmp_path),
         "--pages", pages_path, "--master", "local[4]"]
    )
    assert rc == 2  # partial failure
    out = json.loads(capsys.readouterr().out)
    assert out["notaurl"]["success"] is False
    rc = main(
        ["crawl", some_urls[0], "notaurl", "-l", "1", "-o", str(tmp_path),
         "--pages", pages_path, "--master", "local[4]"]
    )
    assert rc == 0  # limit truncates before the bad url


def test_cli_parity_flags_notice(spark, pages_path, some_urls, tmp_path, capsys):
    rc = main(
        ["crawl", some_urls[0], "-w", "16", "-t", "5", "-o", str(tmp_path),
         "--pages", pages_path, "--master", "local[4]"]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "notice: --workers" in err and "notice: --timeout" in err


def test_cli_kafka_table_fallback(spark, pages_path, some_urls, tmp_path, capsys):
    table = str(tmp_path / "k")
    rc = main(
        ["kafka", *some_urls, "--pages", pages_path, "--content-type", "markdown",
         "--output-table", table, "--session-id", "sess12345", "--master", "local[4]"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert all(r["details"]["content_type"] == "markdown" for r in out.values())
    assert spark.read.parquet(table).count() == len(some_urls)


def test_cli_version(capsys):
    assert main(["version"]) == 0
    assert "pathik_spark" in capsys.readouterr().out


def test_r2_hadoop_conf():
    conf = r2_hadoop_conf("acct", "ak", "sk", region="auto")
    assert conf["fs.s3a.endpoint"] == "https://acct.r2.cloudflarestorage.com"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert conf["fs.s3a.endpoint.region"] == "auto"
    with pytest.raises(ValueError, match="R2_ACCOUNT_ID"):
        r2_hadoop_conf("", "ak", "sk")
    with pytest.raises(ValueError, match="R2_ACCESS_KEY_SECRET"):
        r2_hadoop_conf("acct", "ak", "")


def test_write_r2_objects_local_roundtrip(spark, corpus, tmp_path):
    from pathik_spark.operators.fetch import extract_artifacts, fetch_join
    from pathik_spark.operators.frontier import prepare_frontier

    arts = extract_artifacts(
        fetch_join(prepare_frontier(corpus["seeds"].limit(5)), corpus["pages"]),
        with_markdown=True,
    )
    objs = r2_object_rows(arts, run_id="t")
    dest = str(tmp_path / "r2")
    write_r2_objects(objs, dest)
    back = spark.read.parquet(dest)
    assert back.count() == objs.count()
    assert {"key", "content", "mime"} <= set(back.columns)
