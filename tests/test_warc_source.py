"""WARC source (sources/warc_source.py): distributed archive ingest,
verified as the exact inverse of the sink pair in test_warc.py —
sink -> archives on disk -> source -> byte-identical pages."""

from __future__ import annotations

import datetime
import gzip

import pytest
from pyspark.sql import functions as F

from pathik_spark.sources.sinks import warc_record_rows, write_warc_files
from pathik_spark.sources.warc_source import (
    gunzip_members,
    iter_warc_records,
    parse_warc_header,
    read_warc_archives,
    warc_to_pages,
)


def _artifacts(spark):
    rows = [
        ("https://a.example/x", datetime.datetime(2013, 5, 1, 12, 30, 0), b"<html>alpha</html>", "fetched"),
        ("https://b.example/y", datetime.datetime(2014, 6, 2, 1, 2, 3), b"\x00binary\xff\xfebytes", "fetched"),
        ("https://c.example/z", datetime.datetime(2015, 7, 3, 4, 5, 6), b"<p>gamma</p>", "fetched"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status string"
    )


def _write_archives(spark, tmp_path, n_parts=2):
    recs = warc_record_rows(_artifacts(spark))
    return write_warc_files(recs.repartition(n_parts), str(tmp_path), prefix="t")


def test_source_inverts_sink(spark, tmp_path):
    _write_archives(spark, tmp_path)
    pages = read_warc_archives(spark, str(tmp_path))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
    }
    assert bytes(rows["https://a.example/x"]["html"]) == b"<html>alpha</html>"
    # binary payloads (null bytes, invalid utf-8) survive byte-identically
    assert bytes(rows["https://b.example/y"]["html"]) == b"\x00binary\xff\xfebytes"
    assert rows["https://a.example/x"]["warc_ts"] == datetime.datetime(2013, 5, 1, 12, 30)
    assert rows["https://a.example/x"]["warc_type"] == "resource"
    assert rows["https://a.example/x"]["record_id"].startswith("urn:uuid:")
    assert rows["https://a.example/x"]["archive"].endswith(".warc")

    # the facade returns exactly the input_hint pages contract
    assert warc_to_pages(spark, str(tmp_path)).columns == ["url", "warc_ts", "html"]


def test_source_offsets_match_cdx_index(spark, tmp_path):
    """Provenance: the source's record_offset equals the CDX index the
    sink wrote — random access and bulk scan agree byte-for-byte."""
    recs = warc_record_rows(_artifacts(spark))
    write_warc_files(
        recs.repartition(1),
        str(tmp_path),
        prefix="t",
        index_path=str(tmp_path / "cdx"),
    )
    cdx = {
        (r["url"], r["path"]): r["offset"]
        for r in spark.read.parquet(str(tmp_path / "cdx")).collect()
    }
    for r in read_warc_archives(spark, str(tmp_path)).collect():
        # binaryFile reports a file: URI; the CDX index stores the path
        plain = r["archive"].removeprefix("file:")
        assert cdx[(r["url"], plain)] == r["record_offset"]


def test_gzip_whole_and_member_per_record(spark, tmp_path):
    files = _write_archives(spark, tmp_path / "plain", n_parts=1)
    raw = open(files[0]["path"], "rb").read()

    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    # whole-file gzip
    (gz_dir / "whole.warc.gz").write_bytes(gzip.compress(raw))
    pages = read_warc_archives(spark, str(gz_dir))
    assert pages.count() == 3

    # Common-Crawl layout: one gzip member per record, concatenated
    member_dir = tmp_path / "members"
    member_dir.mkdir()
    records = list(iter_warc_records(raw))
    pos = [off for off, _, _ in records] + [len(raw)]
    members = b"".join(
        gzip.compress(raw[pos[i] : pos[i + 1]]) for i in range(len(records))
    )
    (member_dir / "members.warc.gz").write_bytes(members)
    assert read_warc_archives(spark, str(member_dir)).count() == 3
    # decompressor unit: members stream reassembles the original bytes
    assert gunzip_members(members) == raw


def test_garbage_tolerance(spark, tmp_path):
    files = _write_archives(spark, tmp_path / "plain2", n_parts=1)
    raw = open(files[0]["path"], "rb").read()
    records = list(iter_warc_records(raw))
    assert len(records) == 3
    second = records[1][0]
    dirty_dir = tmp_path / "dirty"
    dirty_dir.mkdir()
    # garbage before, between and after records; one truncated header
    dirty = (
        b"\x99garbage\x00" + raw[:second] + b"WARC/1.0\r\nbroken" + raw[second:]
        + b"trailing junk"
    )
    (dirty_dir / "dirty.warc").write_bytes(dirty)
    pages = read_warc_archives(spark, str(dirty_dir))
    assert pages.count() == 3  # all real records survive, garbage skipped

    # a record whose Content-Length overruns the buffer is dropped, the
    # rest still parse
    trunc = raw[: records[2][0] + 40]  # cut inside the third record
    assert len(list(iter_warc_records(trunc))) == 2


def test_header_parser_units():
    fields = parse_warc_header(
        b"WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 5\r\nX-Odd:  spaced  "
    )
    assert fields[""] == "WARC/1.1"
    assert fields["warc-type"] == "response"
    assert fields["content-length"] == "5"
    assert fields["x-odd"] == "spaced"


def test_type_filter(spark, tmp_path):
    _write_archives(spark, tmp_path)
    all_rows = read_warc_archives(spark, str(tmp_path), warc_types=())
    assert all_rows.count() == 3  # sink writes resource records only
    none = read_warc_archives(spark, str(tmp_path), warc_types=("request",))
    assert none.count() == 0


def test_member_offsets_are_compressed_archive_offsets(spark, tmp_path):
    """CDX semantics for gzipped archives: record_offset is the byte
    offset of the record's COMPRESSED gzip member in the archive (seek +
    gunzip-one-member random access), never an offset into the
    decompressed concatenation."""
    from pathik_spark.sources.warc_source import gzip_member_stream

    files = _write_archives(spark, tmp_path / "plain3", n_parts=1)
    raw = open(files[0]["path"], "rb").read()
    records = list(iter_warc_records(raw))
    pos = [off for off, _, _ in records] + [len(raw)]
    parts = [gzip.compress(raw[pos[i] : pos[i + 1]]) for i in range(len(records))]
    members = b"".join(parts)
    member_dir = tmp_path / "members2"
    member_dir.mkdir()
    (member_dir / "m.warc.gz").write_bytes(members)

    expected_offsets = []
    acc = 0
    for p in parts:
        expected_offsets.append(acc)
        acc += len(p)
    # unit: the member stream yields exactly those compressed offsets
    assert [off for off, _ in gzip_member_stream(members)] == expected_offsets
    # end-to-end: record_offset == the member's compressed offset, and
    # seeking there + decompressing one member recovers the record
    got = {
        r["url"]: r["record_offset"]
        for r in read_warc_archives(spark, str(member_dir)).collect()
    }
    by_url = {f["warc-target-uri"]: off for off, f, _ in records}
    for url, rec_off in got.items():
        i = pos.index(by_url[url])
        assert rec_off == expected_offsets[i]
        import zlib as _z

        d = _z.decompressobj(wbits=_z.MAX_WBITS | 16)
        member = d.decompress(members[rec_off:])
        assert list(iter_warc_records(member))[0][1]["warc-target-uri"] == url


def test_gzip_member_stream_garbage_and_truncation():
    import zlib as _z

    a = gzip.compress(b"alpha")
    b = gzip.compress(b"beta")
    # truncated trailing member: keep fully-decoded members, no raise
    stream = a + b[: len(b) // 2]
    got = list(gzip_member_stream_import()(stream))
    assert got[0] == (0, b"alpha")
    assert len(got) <= 2  # truncated tail never yields phantom members
    # corrupt middle member: decoding stops without raising
    corrupt = a + b"\x1f\x8b" + b"\x00" * 20 + b
    out = gunzip_members(corrupt)
    assert out.startswith(b"alpha")


def gzip_member_stream_import():
    from pathik_spark.sources.warc_source import gzip_member_stream

    return gzip_member_stream


def test_wire_decode_strips_http_layer_and_passes_bare_entities(spark, tmp_path):
    """CC-style archives (response records) come back as ENTITY bytes
    under wire_decode=True; bare-entity records are untouched."""
    from pathik_spark.sources.sinks import warc_response_rows

    arts = _artifacts(spark)
    recs = warc_response_rows(arts)
    write_warc_files(recs, str(tmp_path / "resp"), prefix="r")
    got = {
        r["url"]: bytes(r["html"])
        for r in warc_to_pages(
            spark, str(tmp_path / "resp"), wire_decode=True
        ).collect()
    }
    want = {r["url"]: bytes(r["html"]) for r in arts.collect()}
    assert got == want
    # without the flag the payload keeps its HTTP header block
    raw = {
        r["url"]: bytes(r["html"])
        for r in warc_to_pages(spark, str(tmp_path / "resp")).collect()
    }
    assert all(v.startswith(b"HTTP/1.1 200 OK\r\n") for v in raw.values())
    # bare-entity archives (our own record sink) are invariant under the flag
    write_warc_files(warc_record_rows(arts), str(tmp_path / "bare"), prefix="b")
    bare = {
        r["url"]: bytes(r["html"])
        for r in warc_to_pages(
            spark, str(tmp_path / "bare"), wire_decode=True
        ).collect()
    }
    assert bare == want


def test_wet_to_documents(spark, tmp_path):
    from pathik_spark.sources.sinks import wet_record_rows, write_warc_files
    from pathik_spark.sources.warc_source import wet_to_documents

    arts = spark.createDataFrame(
        [
            ("https://a.example/x", datetime.datetime(2024, 1, 1), "alpha text", "fetched"),
            ("https://b.example/y", datetime.datetime(2024, 1, 2), "beta text", "fetched"),
        ],
        "url string, warc_ts timestamp, text string, status string",
    )
    recs = wet_record_rows(arts)
    write_warc_files(recs, str(tmp_path), prefix="wet")
    docs = wet_to_documents(spark, str(tmp_path))
    got = {r["url"]: (r["text"], r["doc_id"]) for r in docs.collect()}
    assert got["https://a.example/x"][0] == "alpha text"
    assert got["https://b.example/y"][0] == "beta text"
    assert all(isinstance(v[1], int) for v in got.values())
