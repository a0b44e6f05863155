"""WARC sink: JVM-assembled ISO 28500 resource records + per-partition
archive files, verified by an independent byte-level reader."""

from __future__ import annotations

import datetime
import re

from pyspark.sql import functions as F

from pathik_spark.sources.sinks import warc_record_rows, write_warc_files


def _artifacts(spark):
    rows = [
        ("https://a.example/x", datetime.datetime(2013, 5, 1, 12, 30, 0), b"<html>alpha</html>", "fetched"),
        ("https://b.example/y", datetime.datetime(2014, 6, 2, 1, 2, 3), b"\x00binary\xff\xfebytes", "fetched"),
        ("https://c.example/z", datetime.datetime(2014, 6, 2, 1, 2, 3), b"nope", "missing"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status string"
    )


def read_warc(path: str):
    """Minimal independent WARC reader: header block up to CRLFCRLF,
    payload of exactly Content-Length bytes, CRLFCRLF delimiter."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        j = data.index(b"\r\n\r\n", i)
        headers = data[i:j].decode("utf-8")
        length = int(re.search(r"Content-Length: (\d+)", headers).group(1))
        payload = data[j + 4 : j + 4 + length]
        assert data[j + 4 + length : j + 4 + length + 4] == b"\r\n\r\n"
        out.append((headers, payload))
        i = j + 4 + length + 4
    return out


def test_warc_records_roundtrip(spark, tmp_path):
    arts = _artifacts(spark)
    recs = warc_record_rows(arts)
    assert recs.count() == 2  # missing row excluded
    files = write_warc_files(recs.repartition(1), str(tmp_path), prefix="t")
    assert len(files) == 1 and files[0]["n_records"] == 2
    parsed = read_warc(files[0]["path"])
    assert len(parsed) == 2
    by_uri = {
        re.search(r"WARC-Target-URI: (\S+)", h).group(1): (h, p) for h, p in parsed
    }
    h, p = by_uri["https://a.example/x"]
    assert p == b"<html>alpha</html>"
    assert "WARC/1.0" in h and "WARC-Type: resource" in h
    assert "WARC-Date: 2013-05-01T12:30:00Z" in h
    assert re.search(r"WARC-Record-ID: <urn:uuid:[0-9a-f-]{36}>", h)
    # binary payload (null bytes, invalid utf-8) survives byte-identically
    _, p2 = by_uri["https://b.example/y"]
    assert p2 == b"\x00binary\xff\xfebytes"


def test_warc_record_ids_deterministic(spark):
    arts = _artifacts(spark)
    a = {r["url"]: r["record_id"] for r in warc_record_rows(arts).collect()}
    b = {r["url"]: r["record_id"] for r in warc_record_rows(arts).collect()}
    assert a == b
    assert len(set(a.values())) == len(a)  # distinct per url


def test_warc_content_length_counts_payload_bytes(spark):
    arts = _artifacts(spark)
    recs = warc_record_rows(arts).collect()
    for r in recs:
        m = re.search(rb"Content-Length: (\d+)", bytes(r["record"]))
        stated = int(m.group(1))
        # record = header + \r\n\r\n + payload + \r\n\r\n
        header_end = bytes(r["record"]).index(b"\r\n\r\n") + 4
        payload = bytes(r["record"])[header_end:-4]
        assert len(payload) == stated


def test_cdx_index_random_access(spark, tmp_path):
    from pathik_spark.sources.sinks import read_warc_record

    arts = _artifacts(spark)
    recs = warc_record_rows(arts)
    idx_path = str(tmp_path / "cdx")
    files = write_warc_files(
        recs.repartition(2), str(tmp_path / "warc"), prefix="cc", index_path=idx_path
    )
    assert sum(r["n_records"] for r in files) == 2
    idx = {r["url"]: r for r in spark.read.parquet(idx_path).collect()}
    assert set(idx) == {"https://a.example/x", "https://b.example/y"}
    for url, row in idx.items():
        headers, payload = read_warc_record(row["path"], row["offset"], row["length"])
        assert f"WARC-Target-URI: {url}" in headers
    _, p = read_warc_record(*[idx["https://b.example/y"][k] for k in ("path", "offset", "length")])
    assert p == b"\x00binary\xff\xfebytes"


def test_warc_writer_is_idempotent_per_file(spark, tmp_path):
    # 'wb' per task: re-running the same write yields identical bytes,
    # not appended duplicates
    arts = _artifacts(spark)
    recs = warc_record_rows(arts).repartition(1)
    out = str(tmp_path / "w")
    a = write_warc_files(recs, out, prefix="t")
    b = write_warc_files(recs, out, prefix="t")
    assert [(r["path"], r["n_records"], r["n_bytes"]) for r in a] == [
        (r["path"], r["n_records"], r["n_bytes"]) for r in b
    ]
    with open(a[0]["path"], "rb") as f:
        data = f.read()
    assert len(data) == a[0]["n_bytes"]


def _artifacts_with_text(spark):
    rows = [
        ("https://a.example/x", datetime.datetime(2013, 5, 1, 12, 30, 0),
         b"<html>alpha</html>", "alpha text été", "fetched"),
        ("https://b.example/y", datetime.datetime(2014, 6, 2, 1, 2, 3),
         b"<html>beta</html>", None, "fetched"),
        ("https://c.example/z", datetime.datetime(2014, 6, 2, 1, 2, 3),
         b"nope", "dropped", "missing"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, status string"
    )


def test_wet_records_roundtrip_and_refers_to(spark, tmp_path):
    from pathik_spark.sources.sinks import wet_record_rows

    arts = _artifacts_with_text(spark)
    wet = wet_record_rows(arts).collect()
    warc = {r["url"]: r["record_id"] for r in warc_record_rows(arts).collect()}
    assert len(wet) == 2  # missing row excluded
    by_url = {r["url"]: r for r in wet}
    # cross-reference: WET refers_to == the html record's id, own id differs
    for url, r in by_url.items():
        assert r["refers_to"] == warc[url]
        assert r["record_id"] != warc[url]
    # byte-level parse of the record blob
    rec = bytes(by_url["https://a.example/x"]["record"])
    head, _, rest = rec.partition(b"\r\n\r\n")
    headers = head.decode("utf-8")
    assert "WARC-Type: conversion" in headers
    assert "Content-Type: text/plain" in headers
    assert "WARC-Refers-To: <" + warc["https://a.example/x"] + ">" in headers
    length = int(re.search(r"Content-Length: (\d+)", headers).group(1))
    payload = rest[:length]
    assert payload.decode("utf-8") == "alpha text été"
    assert rest[length : length + 4] == b"\r\n\r\n"
    # null text -> empty payload, still a valid record
    rec_b = bytes(by_url["https://b.example/y"]["record"])
    hb = rec_b.split(b"\r\n\r\n")[0].decode()
    assert "Content-Length: 0" in hb


def test_wet_files_written_by_generic_writer(spark, tmp_path):
    from pathik_spark.sources.sinks import wet_record_rows, write_warc_files

    arts = _artifacts_with_text(spark)
    paths = write_warc_files(
        wet_record_rows(arts).repartition(1), str(tmp_path), prefix="test.wet"
    )
    files = [p["path"] for p in paths if p["path"].endswith(".warc")]
    assert files
    parsed = read_warc(files[0])
    assert {h.split("WARC-Target-URI: ")[1].split("\r\n")[0] for h, _ in parsed} == {
        "https://a.example/x", "https://b.example/y"
    }
    assert all("WARC-Type: conversion" in h for h, _ in parsed)


def test_warc_revisit_records_cite_original(spark, tmp_path):
    import hashlib

    from pathik_spark.sources.sinks import (
        read_warc_record,
        warc_record_rows,
        warc_revisit_rows,
        write_warc_files,
    )

    html = b"<html><body>stable content</body></html>"
    arts = spark.createDataFrame(
        [("https://h.example/p", "fetched", bytearray(html))],
        "url string, status string, html binary",
    ).selectExpr("url", "status", "html", "CAST('2025-03-01 00:00:00' AS TIMESTAMP) AS warc_ts")
    orig = warc_record_rows(arts).collect()[0]

    recrawl = arts.selectExpr(
        "url", "html", "CAST('2025-04-01 00:00:00' AS TIMESTAMP) AS warc_ts"
    )
    rv = warc_revisit_rows(recrawl).collect()[0]
    body = bytes(rv["record"])
    text = body.decode("utf-8")
    assert "WARC-Type: revisit" in text
    assert f"WARC-Refers-To: <{orig['record_id']}>" in text
    assert "identical-payload-digest" in text
    assert f"sha1:{hashlib.sha1(html).hexdigest()}" in text
    assert "Content-Length: 0" in text
    assert rv["record_id"] != orig["record_id"]  # distinct capture identity
    assert "2025-04-01" in rv["warc_date"]

    # the record-agnostic writer archives + indexes them like any record
    out = str(tmp_path / "warc")
    idx = str(tmp_path / "idx")
    write_warc_files(
        warc_revisit_rows(recrawl).repartition(1), out, index_path=idx
    )
    row = spark.read.parquet(idx).collect()[0]
    headers, payload = read_warc_record(row["path"], row["offset"], row["length"])
    assert "WARC-Type: revisit" in headers and payload == b""


def test_warc_revisit_record_ids_unique_per_capture(spark):
    """ISO 28500 record-id uniqueness: two revisit captures of the same
    unchanged URL in different rounds carry DISTINCT WARC-Record-IDs,
    while WARC-Refers-To (pure function of url) stays identical."""
    from pathik_spark.sources.sinks import warc_revisit_rows

    def cap(ts):
        return spark.createDataFrame(
            [("https://a.example/p", b"<html>same</html>")],
            "url string, html binary",
        ).selectExpr("url", "html", f"CAST('{ts}' AS TIMESTAMP) AS warc_ts")

    r1 = warc_revisit_rows(cap("2025-04-01 00:00:00")).collect()[0]
    r2 = warc_revisit_rows(cap("2025-05-01 00:00:00")).collect()[0]
    assert r1["record_id"] != r2["record_id"]
    t1 = bytes(r1["record"]).decode()
    t2 = bytes(r2["record"]).decode()
    ref1 = [l for l in t1.split("\r\n") if l.startswith("WARC-Refers-To")]
    ref2 = [l for l in t2.split("\r\n") if l.startswith("WARC-Refers-To")]
    assert ref1 == ref2 and ref1


def test_warc_response_records_roundtrip_to_http_meta(spark, tmp_path):
    """response records (the native Common Crawl shape) written by the
    sink must round-trip through the WARC source into the HTTP header
    parsers: sink -> archive -> read_warc_archives -> http_response_meta
    / http_cache_meta with the original body and warc_ts-derived Date."""
    import datetime as dt

    from pathik_spark.operators.redirects import http_response_meta
    from pathik_spark.operators.revalidate import http_cache_meta
    from pathik_spark.sources.sinks import warc_response_rows
    from pathik_spark.sources.warc_source import read_warc_archives

    arts = _artifacts(spark)
    recs = warc_response_rows(arts)
    out = str(tmp_path / "resp")
    write_warc_files(recs, out)
    pages = read_warc_archives(spark, out)  # keeps response records
    assert {r["warc_type"] for r in pages.select("warc_type").collect()} == {
        "response"
    }
    meta = {
        r["url"]: (r["status_code"], r["mime"])
        for r in http_response_meta(pages).collect()
    }
    assert meta == {
        "https://a.example/x": (200, "text/html"),
        "https://b.example/y": (200, "text/html"),
    }
    cache = {r["url"]: r["date"] for r in http_cache_meta(pages).collect()}
    assert cache["https://a.example/x"] == dt.datetime(2013, 5, 1, 12, 30, 0)
    # the HTTP body is the original html bytes, intact through the
    # header block (binary payload incl. \xff\xfe survives)
    raw = {
        r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()
    }
    body = raw["https://b.example/y"].split(b"\r\n\r\n", 1)[1]
    assert body == b"\x00binary\xff\xfebytes"
