"""Charset sniffing + legacy-page decoding (kernels/charset.py,
functions/charset_udfs.py)."""

from __future__ import annotations

import pytest

from pathik_spark.kernels.charset import (
    decode_html_auto,
    normalize_label,
    sniff_charset,
)

CP1252_PAGE = "<html><body>café – naïve</body></html>".encode("cp1252")
SJIS_PAGE = (
    '<html><head><meta charset="shift_jis"></head><body>日本語</body></html>'
).encode("shift_jis")
GB_PAGE = (
    '<html><meta http-equiv="Content-Type" content="text/html; charset=gb2312">'
    "<body>中文内容</body></html>"
).encode("gbk")


def test_bom_beats_everything():
    body = '<meta charset="shift_jis">hello'.encode("utf-8")
    assert sniff_charset(b"\xef\xbb\xbf" + body) == "utf-8"
    utf16 = "hi".encode("utf-16-le")
    assert sniff_charset(b"\xff\xfe" + utf16) == "utf-16-le"
    assert sniff_charset(b"\xfe\xff" + "hi".encode("utf-16-be")) == "utf-16-be"
    # BOM consumed on decode
    assert decode_html_auto(b"\xff\xfe" + "hi".encode("utf-16-le")) == "hi"
    assert decode_html_auto(b"\xef\xbb\xbfabc") == "abc"


def test_header_beats_meta_and_meta_beats_default():
    assert (
        sniff_charset(SJIS_PAGE, "text/html; charset=EUC-JP") == "euc_jp"
    )
    assert sniff_charset(SJIS_PAGE) == "shift_jis"
    assert sniff_charset(GB_PAGE) == "gbk"  # gb2312 -> gbk alias
    assert sniff_charset(b"<html>plain</html>") == "utf-8"


def test_whatwg_latin1_remap_and_unknown_labels():
    assert normalize_label("ISO-8859-1") == "cp1252"
    assert normalize_label("latin-1") == "cp1252"
    assert normalize_label("bogus-enc-42") is None
    # unknown label in a meta tag falls through to the default
    page = b'<meta charset="bogus-enc-42">x'
    assert sniff_charset(page) == "utf-8"


def test_decode_legacy_pages():
    assert "café – naïve" in decode_html_auto(
        CP1252_PAGE, "text/html; charset=iso-8859-1"
    )
    assert "日本語" in decode_html_auto(SJIS_PAGE)
    assert "中文内容" in decode_html_auto(GB_PAGE)
    # totality: garbage bytes + lying header never raise
    assert isinstance(
        decode_html_auto(b"\xff\x00\xfe garbage", "charset=utf-16-le"), str
    )
    assert decode_html_auto(None) == ""


@pytest.mark.parametrize("cap,expect", [(None, True), (8, False)])
def test_fetch_cap(cap, expect):
    text = decode_html_auto(b"12345678<p>tail</p>", fetch_cap=cap)
    assert ("tail" in text) is expect


def test_transcode_udf_feeds_utf8_kernel(spark):
    from pyspark.sql import functions as F

    from pathik_spark.functions.charset_udfs import (
        make_sniff_charset_udf,
        make_transcode_utf8_udf,
    )
    from pathik_spark.kernels.extract import extract_text

    rows = [
        ("http://l.example/cp1252", CP1252_PAGE, "text/html; charset=latin-1"),
        ("http://l.example/sjis", SJIS_PAGE, None),
        ("http://l.example/utf8", "<p>déjà utf-8</p>".encode(), None),
        ("http://l.example/null", None, None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, content_type string")
    out = df.select(
        "url",
        make_sniff_charset_udf()("html", "content_type").alias("cs"),
        make_transcode_utf8_udf()("html", "content_type").alias("u8"),
    )
    got = {r["url"]: r.asDict() for r in out.collect()}
    assert got["http://l.example/cp1252"]["cs"] == "cp1252"
    assert got["http://l.example/sjis"]["cs"] == "shift_jis"
    assert got["http://l.example/utf8"]["cs"] == "utf-8"
    assert got["http://l.example/null"]["u8"] is None
    # the transcoded bytes flow through the UNCHANGED utf-8 kernel
    assert "café – naïve" in extract_text(
        bytes(got["http://l.example/cp1252"]["u8"])
    )
    assert "日本語" in extract_text(bytes(got["http://l.example/sjis"]["u8"]))
