"""HTTP wire-layer decode operator: chunked framing + content codings.

The DataFrame face of kernels/httpwire.py. Input is the Common-Crawl
``response``-record shape (url, payload binary); output replaces the
wire body with entity bytes and labels what was undone — the step that
must run between sources/warc_source ingest and charset/extraction,
because archives keep payloads exactly as transferred (still chunked,
still gzipped).

Plan shape: one mapInPandas pass, scan-local (no shuffle — the decode
happens inside whatever scan already carries the records, so at 64k
archives it adds zero stages). Header metadata extraction
(``transfer_meta``) is separate and pure-expression so plans that only
need the labels (audits, codec histograms) never pay the Python hop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathik_spark.kernels import httpwire as W


def transfer_meta(
    records: DataFrame, payload_col: str = "html", head_bytes: int = 8192
) -> DataFrame:
    """(url, chunked, content_encoding) from the header window — pure
    codegen'd expressions, the cheap companion to
    redirects.http_response_meta (same bounded-head discipline).
    ``content_encoding`` is the lowercased header value with identity
    tokens dropped and internal whitespace normalized ('' if none)."""
    head = F.substring(F.col(payload_col), 1, head_bytes).cast("string")
    hdr = F.substring_index(head, "\r\n\r\n", 1)
    te = F.lower(
        F.regexp_extract(hdr, r"(?im)^Transfer-Encoding:[ \t]*([^\r\n]+)", 1)
    )
    ce_raw = F.lower(
        F.regexp_extract(hdr, r"(?im)^Content-Encoding:[ \t]*([^\r\n]+)", 1)
    )
    ce = F.array_join(
        F.filter(
            F.transform(F.split(ce_raw, ","), lambda t: F.trim(t)),
            lambda t: (t != "") & (t != "identity"),
        ),
        ",",
    )
    return records.select(
        "url",
        te.contains("chunked").alias("chunked"),
        ce.alias("content_encoding"),
    )


def encode_http_bodies(
    rows: DataFrame,
    entity_col: str = "body",
    codings_col: str = "codings",
    chunked_col: str = "chunked",
    url_col: str = "url",
) -> DataFrame:
    """(url, payload) — the deterministic encoder twin: build full wire
    payloads from entity bytes (kernels/httpwire.build_response; fixed
    compression level, MTIME=0). ``codings`` is a comma-joined string
    applied left-to-right ('' = none). Used to write response-record
    fixtures and as the oracle round-trip's forward leg."""
    src = rows.select(
        F.col(url_col).alias("url"),
        F.col(entity_col).alias("_entity"),
        F.col(codings_col).alias("_codings"),
        F.col(chunked_col).alias("_chunked"),
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                W.build_response(
                    bytes(e or b""),
                    codings=[c for c in (cs or "").split(",") if c],
                    chunked=bool(ch),
                )
                for e, cs, ch in zip(
                    pdf["_entity"], pdf["_codings"], pdf["_chunked"]
                )
            ]
            yield pd.DataFrame({"url": pdf["url"], "payload": payloads})

    return src.mapInPandas(_encode, schema)


def decode_http_bodies(
    records: DataFrame,
    payload_col: str = "html",
    url_col: str = "url",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(url, *passthrough, body, applied, ok) — entity bytes per
    response payload.

    ``applied`` lists the wire layers actually undone in application
    order (e.g. 'chunked,gzip'); ``ok=False`` marks a payload whose
    declared coding could not be fully undone (truncated stream,
    unknown coding, bomb guard) — the bytes stand as far as decoding
    got, callers route or drop. Payloads that are not HTTP responses
    pass through as already-entity bytes. One Arrow batch pass, total
    over garbage; ``passthrough`` columns ride along (no join-back
    shuffle for callers that carry warc_ts etc.)."""
    src = records.select(
        F.col(url_col).alias("url"),
        *[F.col(c) for c in passthrough],
        F.col(payload_col).alias("_payload"),
    )
    schema = T.StructType(
        [T.StructField("url", T.StringType())]
        + [src.schema[c] for c in passthrough]
        + [
            T.StructField("body", T.BinaryType()),
            T.StructField("applied", T.StringType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies, applieds, oks = [], [], []
            for payload in pdf["_payload"]:
                body, applied, ok = W.decode_body(bytes(payload or b""))
                bodies.append(body)
                applieds.append(applied)
                oks.append(ok)
            out = pdf.drop(columns=["_payload"]).copy()
            out["body"] = bodies
            out["applied"] = applieds
            out["ok"] = oks
            yield out

    return src.mapInPandas(_decode, schema)
