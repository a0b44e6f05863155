"""RFC 3986 reference resolution (functions/resolve.py) and redirect-
chain following (operators/redirects.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.functions.resolve import (
    DOT_POP_ROUNDS,
    resolve_reference,
    resolve_reference_expr,
)
from pathik_spark.operators.redirects import resolve_redirects

BASES = [
    "http://h.example/a/b/c?q=1",
    "https://h.example:8443/d1/d2/d3/d4/d5/d6/d7/page",
    "http://h.example",
    "http://h.example/",
    "http://h.example/dir/",
    "http://h.example/a/b#sec",
    "HTTP://h.example/a/b",
]

REFS = [
    None,
    "",
    "   ",
    "#frag",
    "http://abs.example/x/y",
    "https://abs.example/x/../y",  # ref with scheme: dots KEPT (urljoin)
    "//cdn.example/lib.js",
    "/login",
    "/p/../q/./r",
    "/../above-root",
    "?page=2",
    "next",
    "g;p=1?y",
    "../up",
    "../../x",
    "../../../../../../deep",
    "./same/./dir",
    "g/..",
    "g/../h/",
    "item?id=7#x",
    "a/b/c/../../d",
    "trailing/.",
    "?next=/a/../b",  # dots inside a query are payload, not path
]


def test_expression_matches_urljoin_kernel(spark):
    rows = [
        (i, b, r) for i, (b, r) in enumerate(
            (b, r) for b in BASES for r in REFS
        )
    ]
    df = spark.createDataFrame(rows, "i long, base string, ref string")
    got = {
        r["i"]: r["res"]
        for r in df.select(
            "i", resolve_reference_expr(F.col("base"), F.col("ref")).alias("res")
        ).collect()
    }
    for i, b, r in rows:
        assert got[i] == resolve_reference(b, r), (b, r, got[i])


def test_kernel_matches_raw_urljoin_modulo_fragments():
    from urllib.parse import urljoin

    # on fragment-free inputs the kernel IS urljoin
    for b in BASES[:2]:
        for r in ["/x", "../y", "?q=2", "g", "//c.example/z"]:
            assert resolve_reference(b, r) == urljoin(b, r)


def test_dot_pop_depth_bound(spark):
    # depth == DOT_POP_ROUNDS resolves exactly; each level needs a round
    ref = "../" * DOT_POP_ROUNDS + "deep"
    base = "http://h.example/" + "/".join(f"s{i}" for i in range(DOT_POP_ROUNDS + 1))
    df = spark.createDataFrame([(base, ref)], "base string, ref string")
    (res,) = df.select(
        resolve_reference_expr(F.col("base"), F.col("ref")).alias("r")
    ).collect()[0]
    assert res == resolve_reference(base, ref) == "http://h.example/deep"


def _fetch_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, status_code int, location string"
    )


CHAIN_ROWS = [
    ("http://s.example/content", 200, None),
    ("http://s.example/one-hop", 301, "http://s.example/content"),
    ("http://s.example/rel", 302, "/content"),
    ("http://s.example/two-hop", 301, "/one-hop"),
    ("http://s.example/query", 303, "?page=2"),
    ("http://s.example/nolocation", 301, None),
    ("http://s.example/blank", 308, "   "),
    ("http://s.example/loop-a", 307, "http://s.example/loop-b"),
    ("http://s.example/loop-b", 308, "http://s.example/loop-a"),
    ("http://s.example/self", 301, "http://s.example/self"),
    ("http://s.example/dots", 301, "../q/./x"),
    # NULL status with a Location-looking value (a non-HTTP payload
    # through http_response_meta): must land in the non-redirect branch,
    # not vanish under three-valued NULL logic
    ("http://s.example/nonhttp", None, "/somewhere"),
]


def test_chain_semantics(spark):
    out = {
        r["url"]: (r["final_url"], r["n_hops"], r["terminal"])
        for r in resolve_redirects(_fetch_df(spark, CHAIN_ROWS)).collect()
    }
    assert len(out) == len(CHAIN_ROWS)
    s = "http://s.example"
    assert out[f"{s}/content"] == (f"{s}/content", 0, "final")
    assert out[f"{s}/one-hop"] == (f"{s}/content", 1, "final")
    # root-relative Location resolves onto the in-table content URL
    assert out[f"{s}/rel"] == (f"{s}/content", 1, "final")
    assert out[f"{s}/two-hop"] == (f"{s}/content", 2, "final")
    # query-only Location: target not in the table -> dangling final
    assert out[f"{s}/query"] == (f"{s}/query?page=2", 1, "final")
    # 3xx without a followable Location never walks
    assert out[f"{s}/nolocation"] == (f"{s}/nolocation", 0, "final")
    assert out[f"{s}/blank"] == (f"{s}/blank", 0, "final")
    # 2-cycle: stops on the revisit, final_url is the far side
    assert out[f"{s}/loop-a"] == (f"{s}/loop-b", 1, "loop")
    assert out[f"{s}/loop-b"] == (f"{s}/loop-a", 1, "loop")
    assert out[f"{s}/self"] == (f"{s}/self", 0, "loop")
    assert out[f"{s}/dots"] == (f"{s}/q/x", 1, "final")
    assert out[f"{s}/nonhttp"] == (f"{s}/nonhttp", 0, "final")


@pytest.mark.parametrize("length,cap,hops,terminal", [
    (5, 10, 5, "final"),      # ladder shorter than the cap walks off the end
    (12, 10, 10, "max_hops"), # longer ladder parks at the cap, still a source
    (10, 10, 10, "final"),    # exactly-at-cap chain that ENDS is final
])
def test_hop_cap(spark, length, cap, hops, terminal):
    rows = [
        (f"http://l.example/p{i}", 301, f"http://l.example/p{i + 1}")
        for i in range(length)
    ]
    out = {
        r["url"]: (r["final_url"], r["n_hops"], r["terminal"])
        for r in resolve_redirects(_fetch_df(spark, rows), max_hops=cap).collect()
    }
    assert out["http://l.example/p0"] == (
        f"http://l.example/p{hops}", hops, terminal
    )


def _http_response(status_line: str, headers: list[str], body: bytes) -> bytes:
    return (
        "\r\n".join([status_line, *headers]).encode("ascii") + b"\r\n\r\n" + body
    )


def _warc_response_record(url: str, payload: bytes) -> bytes:
    header = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:test-{abs(hash(url))}>\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode("ascii")
    return header + b"\r\n" + payload + b"\r\n\r\n"


def test_http_response_meta(spark):
    rows = [
        (
            "http://s.example/r",
            _http_response(
                "HTTP/1.1 301 Moved Permanently",
                ["Server: x", "location:  /target ", "Content-Type: text/html; charset=utf-8"],
                b"<html>moved</html>",
            ),
        ),
        (
            "http://s.example/ok",
            _http_response(
                "HTTP/1.1 200 OK",
                ["Content-Type: image/png"],
                b"\x89PNG\r\n\x1a\n" + bytes(range(256)),  # binary body
            ),
        ),
        # a Location-looking line in the BODY must not parse as a header
        (
            "http://s.example/body-trap",
            _http_response(
                "HTTP/1.1 200 OK",
                ["Content-Type: text/plain"],
                b"Location: /not-a-header\r\n",
            ),
        ),
        ("http://s.example/resource", b"<html>bare resource record</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    from pathik_spark.operators.redirects import http_response_meta

    out = {
        r["url"]: (r["status_code"], r["location"], r["mime"], r["charset"])
        for r in http_response_meta(df).collect()
    }
    assert out["http://s.example/r"] == (301, "/target", "text/html", "utf-8")
    assert out["http://s.example/ok"] == (200, None, "image/png", None)
    assert out["http://s.example/body-trap"] == (200, None, "text/plain", None)
    assert out["http://s.example/resource"] == (None, None, None, None)


def test_warc_to_redirect_chains_end_to_end(spark, tmp_path):
    """Common-Crawl-shaped loop: WARC response records -> header parse
    -> chain resolution."""
    from pathik_spark.operators.redirects import http_response_meta
    from pathik_spark.sources.warc_source import read_warc_archives

    records = [
        _warc_response_record(
            "http://w.example/start",
            _http_response("HTTP/1.1 302 Found", ["Location: /mid"], b""),
        ),
        _warc_response_record(
            "http://w.example/mid",
            _http_response(
                "HTTP/1.1 301 Moved", ["Location: http://w.example/end"], b""
            ),
        ),
        _warc_response_record(
            "http://w.example/end",
            _http_response("HTTP/1.1 200 OK", ["Content-Type: text/html"], b"<p>hi</p>"),
        ),
    ]
    (tmp_path / "t.warc").write_bytes(b"".join(records))
    pages = read_warc_archives(spark, str(tmp_path))
    out = {
        r["url"]: (r["final_url"], r["n_hops"], r["terminal"])
        for r in resolve_redirects(http_response_meta(pages)).collect()
    }
    assert out["http://w.example/start"] == ("http://w.example/end", 2, "final")
    assert out["http://w.example/end"] == ("http://w.example/end", 0, "final")


def test_plan_has_no_cartesian_product(spark):
    plan = resolve_redirects(
        _fetch_df(spark, CHAIN_ROWS)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
