"""WARC archive SOURCE: distributed ingest of ISO 28500 archives into
the engine's pages shape (url, warc_ts, html) — the read half of the
sink pair in sources/sinks.py (`warc_record_rows`/`write_warc_files`).

This is the Common-Crawl entry path: a crawl dump is tens of thousands
of ~1 GB archives, and the archive is the natural unit of parallelism —
`spark.read.format("binaryFile")` gives one row per archive, then ONE
mapInPandas pass parses records out of the raw bytes (scan-local: no
shuffle, no Python per record header field — the parser walks each
archive's buffer once, offset-arithmetic only). At 64k archives the
scan is 64k tasks; nothing in the plan grows with record count.

Format notes:
- Handles WARC/1.0 and WARC/1.1 headers, any WARC-Type (callers filter),
  and both plain `.warc` and gzipped archives. Common Crawl gzips each
  record as its own member and concatenates the members; zlib's gzip
  decoder is looped over members, so both whole-file gzip and
  member-per-record gzip decode with the same code.
- Total over garbage (same discipline as kernels/media.py): a malformed
  region skips forward to the next "WARC/" magic instead of raising —
  one corrupt record in a 1 GB archive must not kill the task. The
  number of parsed records per archive is emitted so callers can audit
  drops (`records` vs a CDX count).

Reference parity: justrach/pathik stores fetched pages as loose files /
Kafka messages (storage.go); WARC in+out is the archival re-expression
required for crawl interchange at 10^10 scale.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"
_MAX_HEADER = 64 * 1024  # a WARC header block beyond 64 KB is garbage
_GZ_CHUNK = 1 << 20  # feed the decompressor 1 MB slices


def gzip_member_stream(buf: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (member_byte_offset, decompressed_bytes) per gzip member of
    a concatenated-member archive (the Common Crawl per-record layout) —
    or a single member for whole-file gzip.

    Cost discipline: the decompressor is fed bounded memoryview slices,
    never ``buf[pos:]`` — slicing the remaining tail per member would be
    O(members x archive_size) memcpy (terabytes on a real ~1 GB
    member-per-record archive). With chunked feeding, ``unused_data``
    holds at most one chunk, so the whole stream is O(archive_size)."""
    mv = memoryview(buf)
    n = len(buf)
    pos = 0
    while pos < n and buf[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = []
        fed = pos
        try:
            while fed < n and not d.eof:
                end = min(fed + _GZ_CHUNK, n)
                out.append(d.decompress(mv[fed:end]))
                fed = end
        except zlib.error:
            # corrupt member: keep what decoded, stop (garbage tolerance)
            yield pos, b"".join(out)
            return
        yield pos, b"".join(out)
        if not d.eof:  # truncated trailing member
            return
        consumed = (fed - pos) - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover - decompressor guarantee
            return
        pos += consumed


def gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members — or a single member —
    into one byte stream."""
    return b"".join(data for _, data in gzip_member_stream(buf))


def parse_warc_header(block: bytes) -> dict[str, str]:
    """Parse one header block (bytes up to, not including, CRLFCRLF)
    into {lower-case-field: value}; the version line is under ''. """
    fields: dict[str, str] = {}
    for i, line in enumerate(block.split(b"\r\n")):
        text = line.decode("utf-8", errors="replace")
        if i == 0:
            fields[""] = text.strip()
            continue
        k, sep, v = text.partition(":")
        if sep:
            fields[k.strip().lower()] = v.strip()
    return fields


def iter_warc_records(
    buf: bytes,
) -> Iterator[tuple[int, dict[str, str], bytes]]:
    """Yield (offset, header_fields, payload) for each well-formed record
    in an uncompressed WARC byte stream; skip malformed regions by
    scanning to the next record magic."""
    pos = 0
    n = len(buf)
    while pos < n:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = buf.find(b"\r\n\r\n", start, start + _MAX_HEADER)
        if head_end < 0:
            pos = start + 5
            continue
        fields = parse_warc_header(buf[start:head_end])
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            pos = start + 5
            continue
        body_start = head_end + 4
        body_end = body_start + clen
        if clen < 0 or body_end > n:
            pos = start + 5
            continue
        yield start, fields, buf[body_start:body_end]
        # mandatory CRLFCRLF block delimiter after the payload
        pos = body_end


WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("archive", T.StringType()),
        T.StructField("record_offset", T.LongType()),
    ]
)


def _archive_records(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            buf = bytes(content)
            if buf[:2] == _GZIP_MAGIC:
                # record_offset for gzipped archives is the COMPRESSED
                # member's byte offset in the archive — the CDX
                # convention, so provenance joins against a CDX index and
                # random access (seek + gunzip one member) both work. In
                # the member-per-record CC layout that is exact per
                # record; records sharing one member (whole-file gzip)
                # share the member's offset.
                record_iter = (
                    (m_off, fields, payload)
                    for m_off, data in gzip_member_stream(buf)
                    for _, fields, payload in iter_warc_records(data)
                )
            else:
                record_iter = iter_warc_records(buf)
            for offset, fields, payload in record_iter:
                rows.append(
                    (
                        fields.get("warc-target-uri"),
                        pd.to_datetime(
                            fields.get("warc-date"), utc=True, errors="coerce"
                        ),
                        payload,
                        fields.get("warc-type"),
                        fields.get("warc-record-id", "").strip("<>"),
                        fields.get("content-type"),
                        path,
                        offset,
                    )
                )
        out = pd.DataFrame(
            rows,
            columns=[
                "url",
                "warc_ts",
                "html",
                "warc_type",
                "record_id",
                "content_type",
                "archive",
                "record_offset",
            ],
        )
        # tz-aware -> naive UTC (Spark TimestampType, session tz UTC)
        if len(out):
            out["warc_ts"] = out["warc_ts"].dt.tz_localize(None)
        yield out


def read_warc_archives(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("resource", "response"),
) -> DataFrame:
    """Distributed WARC ingest: one task per archive file, records
    parsed scan-local. Returns the engine pages shape plus provenance
    (archive path + byte offset — lineage back to the source dump;
    for gzipped archives the offset is the compressed member offset,
    CDX semantics).

    ``path`` accepts a directory or a glob (binaryFile semantics);
    plain and gzipped archives mix freely. ``warc_types`` filters
    record types (warcinfo/request/metadata records are noise for the
    pages table); pass () to keep everything."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    pages = raw.mapInPandas(_archive_records, WARC_PAGES_SCHEMA)
    if warc_types:
        pages = pages.filter(F.col("warc_type").isin(*warc_types))
    return pages


def warc_to_pages(
    spark: SparkSession, path: str, wire_decode: bool = False
) -> DataFrame:
    """Facade: archives -> the exact input_hint pages contract
    (url, warc_ts, html) ready for CrawlRun / the extraction kernels.

    ``wire_decode=True`` is for Common-Crawl-style archives whose
    records are raw HTTP ``response`` payloads: the header block is
    stripped and chunked/gzip/deflate wire layers undone
    (operators/transfer.decode_http_bodies), so ``html`` is entity
    bytes. Records that are already bare entities (resource/conversion
    records, this engine's own sink output) pass through untouched, so
    the flag is safe on mixed archives."""
    pages = read_warc_archives(spark, path).select("url", "warc_ts", "html")
    if not wire_decode:
        return pages
    from pathik_spark.operators.transfer import decode_http_bodies

    # scan-local: warc_ts rides through the decode pass, no join-back
    return decode_http_bodies(pages, passthrough=("warc_ts",)).select(
        "url", "warc_ts", F.col("body").alias("html")
    )


def wet_to_documents(
    spark: SparkSession, path: str, id_from_hash: bool = True
) -> DataFrame:
    """WET ingest: Common Crawl's extracted-text sidecar archives
    (``conversion`` records, text/plain payloads) -> the documents
    shape (doc_id, url, warc_ts, text) the cleaning/dedup family
    consumes. Many corpus builds START here — CC has already run
    extraction, so the pipeline is WET -> clean -> dedup -> export.

    ``doc_id`` is the portable 60-bit url hash by default (stable
    across runs and clusters; pass False to keep no id and assign
    ingest sequence downstream). UTF-8 payload decode happens in the
    JVM cast with replacement semantics — a stray invalid byte in a
    100 TB dump is data, not an exception."""
    from pathik_spark.operators.dedup import portable_hash64

    recs = read_warc_archives(spark, path, warc_types=("conversion",))
    out = recs.select(
        "url", "warc_ts", F.col("html").cast("string").alias("text")
    )
    if id_from_hash:
        out = out.select(
            portable_hash64(F.col("url")).alias("doc_id"),
            "url", "warc_ts", "text",
        )
    return out
