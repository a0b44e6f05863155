"""HTTP wire decode: chunked framing + content codings
(kernels/httpwire + operators/transfer)."""

from __future__ import annotations

import gzip as gzip_mod
import zlib

from pyspark.sql import Row

from pathik_spark.kernels import httpwire as W
from pathik_spark.operators.transfer import decode_http_bodies, transfer_meta


def _payload(entity=b"<html>hi</html>", **kw):
    return W.build_response(entity, **kw)


# --- kernel ----------------------------------------------------------------


def test_identity_passthrough():
    body, applied, ok = W.decode_body(_payload())
    assert (body, applied, ok) == (b"<html>hi</html>", "", True)


def test_gzip_roundtrip_and_independent_encoder():
    entity = b"x" * 5000 + b"<p>tail</p>"
    body, applied, ok = W.decode_body(_payload(entity, codings=["gzip"]))
    assert (body, applied, ok) == (entity, "gzip", True)
    # independently produced gzip bytes (stdlib gzip module, not our twin)
    wire = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + gzip_mod.compress(entity, mtime=0)
    )
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (entity, "gzip", True)


def test_deflate_both_flavors():
    entity = b"deflate me " * 100
    body, _, ok = W.decode_body(_payload(entity, codings=["deflate"]))
    assert ok and body == entity
    # mislabeled raw-DEFLATE stream under a 'deflate' header
    body, _, ok = W.decode_body(_payload(entity, codings=["x-deflate"]))
    assert ok and body == entity


def test_chunked_and_stacked_codings():
    entity = b"abc" * 2000
    wire = _payload(entity, codings=["gzip"], chunked=True, chunk_size=333)
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (entity, "chunked,gzip", True)
    # double-gzip applies right-to-left on decode
    wire = _payload(entity, codings=["gzip", "gzip"])
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (entity, "gzip,gzip", True)


def test_chunk_extensions_and_trailers():
    entity = b"hello world"
    framed = (
        b"6;ext=1\r\nhello \r\n5\r\nworld\r\n0\r\nTrailer: x\r\n\r\n"
    )
    wire = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + framed
    )
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (entity, "chunked", True)


def test_failures_fail_closed():
    # truncated gzip: original bytes stand, ok False
    entity = b"y" * 4000
    good = _payload(entity, codings=["gzip"])
    hdr, bod = W.split_response(good)
    trunc = hdr + b"\r\n\r\n" + bod[: len(bod) // 2]
    body, applied, ok = W.decode_body(trunc)
    assert not ok and body == bod[: len(bod) // 2] and applied == ""
    # unknown coding: passthrough, ok False
    wire = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nBRBYTES"
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (b"BRBYTES", "", False)
    # bad chunk-size line
    wire = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx"
    body, applied, ok = W.decode_body(wire)
    assert not ok and applied == ""
    # no header separator at all
    body, applied, ok = W.decode_body(b"HTTP/1.1 200 OK\r\nX: 1")
    assert (body, applied, ok) == (b"", "", True)


def test_lf_only_headers():
    entity = zlib.compress(b"lf servers exist")
    wire = b"HTTP/1.1 200 OK\nContent-Encoding: deflate\n\n" + entity
    body, applied, ok = W.decode_body(wire)
    assert (body, applied, ok) == (b"lf servers exist", "deflate", True)


def test_coding_layer_bomb_guard():
    wire = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip, gzip, gzip, gzip, gzip"
        b"\r\n\r\nx"
    )
    _, applied, ok = W.decode_body(wire)
    assert not ok and applied == ""


# --- operator ---------------------------------------------------------------


def test_decode_http_bodies_and_meta(spark):
    rows = [
        Row(url="u1", html=_payload(b"plain")),
        Row(url="u2", html=_payload(b"gz" * 500, codings=["gzip"])),
        Row(
            url="u3",
            html=_payload(b"ch" * 700, codings=["deflate"], chunked=True),
        ),
        Row(url="u4", html=b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nZ"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in decode_http_bodies(df).collect()}
    assert bytes(got["u1"]["body"]) == b"plain" and got["u1"]["ok"]
    assert bytes(got["u2"]["body"]) == b"gz" * 500
    assert got["u2"]["applied"] == "gzip"
    assert bytes(got["u3"]["body"]) == b"ch" * 700
    assert got["u3"]["applied"] == "chunked,deflate"
    assert not got["u4"]["ok"] and bytes(got["u4"]["body"]) == b"Z"

    meta = {r["url"]: r for r in transfer_meta(df).collect()}
    assert not meta["u1"]["chunked"] and meta["u1"]["content_encoding"] == ""
    assert meta["u2"]["content_encoding"] == "gzip"
    assert meta["u3"]["chunked"] and meta["u3"]["content_encoding"] == "deflate"
    assert meta["u4"]["content_encoding"] == "br"


def test_decode_plan_is_scan_local(spark):
    """decode_http_bodies must add no Exchange: the Python pass runs
    inside the scan that carries the records."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(url="u", html=b"HTTP/1.1 200 OK\r\n\r\nx")],
        "url string, html binary",
    )
    plan = (
        decode_http_bodies(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# --- fuzz (same discipline as the HTTP status-line parser fuzz) -------------


def test_decode_total_over_garbage():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=2048))
    def prop(payload):
        body, applied, ok = W.decode_body(payload)
        assert isinstance(body, bytes)
        assert isinstance(applied, str) and isinstance(ok, bool)
        assert len(body) <= max(len(payload), W.FETCH_CAP)

    prop()


def test_decode_total_over_hostile_http_shells():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header = st.sampled_from(
        [
            b"Content-Encoding: gzip",
            b"Content-Encoding: deflate",
            b"Content-Encoding: br, gzip",
            b"Transfer-Encoding: chunked",
            b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
            b"Content-Encoding: " + b"gzip, " * 10 + b"gzip",
        ]
    )

    @settings(max_examples=300, deadline=None)
    @given(header, st.binary(max_size=1024))
    def prop(hdr, body):
        payload = b"HTTP/1.1 200 OK\r\n" + hdr + b"\r\n\r\n" + body
        out, applied, ok = W.decode_body(payload)
        assert isinstance(out, bytes) and isinstance(ok, bool)

    prop()
