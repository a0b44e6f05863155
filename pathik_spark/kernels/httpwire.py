"""HTTP/1.1 wire decoding: chunked transfer framing + content codings.

Common-Crawl WARC ``response`` records store the payload exactly as it
crossed the wire: status line + headers + CRLFCRLF + body, where the
body may still be chunked (Transfer-Encoding, RFC 9112 §7.1) and/or
compressed (Content-Encoding, RFC 9110 §8.4). Everything downstream —
charset sniffing (kernels/charset.py), extraction (kernels/extract.py),
redirect/cache header analysis — needs the ENTITY bytes, so this
kernel undoes the wire layers in wire order: de-chunk first (transfer
coding is outermost), then decompress.

Codings (RFC 9110 §8.4.1):
- ``gzip`` / ``x-gzip``: RFC 1952 member(s) via zlib wbits=16+15;
- ``deflate`` / ``x-deflate``: RFC 1950 zlib stream, with the
  raw-DEFLATE fallback (wbits=-15) for the historically mislabeling
  servers (the same leniency browsers ship);
- ``identity`` / absent: passthrough;
- anything else (``br``, ``zstd``, ...): labeled passthrough — the
  bytes come back untouched with ``ok=False`` so callers can route or
  drop (no brotli/zstd lib in this environment; the label preserves
  the information).

Multiple codings ("Content-Encoding: gzip, gzip") apply right-to-left,
bounded to 4 layers (a decompression-bomb guard, like the FETCH_CAP
output bound below).

Total over garbage, like kernels/media.py: a truncated stream, a bad
chunk-size line, output past FETCH_CAP — each fails CLOSED with the
original bytes and ``ok=False``; one hostile response must never kill
a 10^10-row task.

Reference parity: justrach/pathik delegates wire decoding to its Go
HTTP client (net/http transparently de-chunks and un-gzips,
crawler.go's fetch path); archived-payload analysis has to reimplement
the same two layers explicitly.
"""

from __future__ import annotations

import zlib

from pathik_spark.kernels.extract import FETCH_CAP

MAX_CODING_LAYERS = 4
_CRLFCRLF = b"\r\n\r\n"
_LFLF = b"\n\n"


def split_response(payload: bytes) -> tuple[bytes, bytes]:
    """(header_bytes, body_bytes) at the first blank line; a payload
    with no header/body separator is all header (empty body)."""
    i = payload.find(_CRLFCRLF)
    if i >= 0:
        return payload[:i], payload[i + 4 :]
    j = payload.find(_LFLF)  # lenient: bare-LF emitters exist
    if j >= 0:
        return payload[:j], payload[j + 2 :]
    return payload, b""


def _header_values(header: bytes, name: bytes) -> list[bytes]:
    out = []
    target = name.lower()
    for line in header.split(b"\n"):
        k, _, v = line.partition(b":")
        if k.strip().lower() == target:
            out.append(v.strip().rstrip(b"\r"))
    return out


def codings_of(header: bytes) -> tuple[bool, list[str]]:
    """(is_chunked, content_codings) from raw header bytes. Codings in
    header order (leftmost = innermost = first applied by the sender).
    ``identity`` entries are dropped."""
    te = b",".join(_header_values(header, b"transfer-encoding")).lower()
    chunked = b"chunked" in te
    codings: list[str] = []
    for v in _header_values(header, b"content-encoding"):
        for tok in v.split(b","):
            t = tok.strip().lower().decode("ascii", "replace")
            if t and t != "identity":
                codings.append(t)
    return chunked, codings


def dechunk(body: bytes) -> tuple[bytes, bool]:
    """Undo chunked framing: hex-size CRLF data CRLF ... 0 CRLF
    [trailers] CRLF. Chunk extensions (``;...``) are ignored per RFC
    9112 §7.1.1. Returns (entity, ok); any framing error returns the
    ORIGINAL bytes with ok=False."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        sep = 2
        if eol < 0:
            eol = body.find(b"\n", pos)
            sep = 1
        if eol < 0:
            return bytes(body), False
        size_line = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_line, 16)
        except ValueError:
            return bytes(body), False
        if size < 0 or len(out) + size > FETCH_CAP:
            return bytes(body), False
        pos = eol + sep
        if size == 0:
            return bytes(out), True  # trailers, if any, are dropped
        if pos + size > n:
            return bytes(body), False
        out += body[pos : pos + size]
        pos += size
        # the CRLF after the chunk data
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
        else:
            return bytes(body), False


def _inflate(data: bytes, wbits: int) -> bytes | None:
    try:
        d = zlib.decompressobj(wbits)
        out = d.decompress(data, FETCH_CAP + 1)
        if len(out) > FETCH_CAP:
            return None
        return out
    except zlib.error:
        return None


def decompress_one(data: bytes, coding: str) -> tuple[bytes, bool]:
    """Undo ONE content coding; unknown codings and failures return the
    input bytes with ok=False."""
    if coding in ("gzip", "x-gzip"):
        # 16+15: gzip wrapper; members may be concatenated (rare for
        # entities, standard for WARC files) — loop like warc_source
        out = bytearray()
        rest = data
        while rest:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                out += d.decompress(rest, FETCH_CAP + 1 - len(out))
            except zlib.error:
                return data, False
            if len(out) > FETCH_CAP or not d.eof:
                return data, False
            rest = d.unused_data
        return bytes(out), True
    if coding in ("deflate", "x-deflate"):
        got = _inflate(data, zlib.MAX_WBITS)  # RFC-correct zlib wrapper
        if got is None:
            got = _inflate(data, -zlib.MAX_WBITS)  # mislabeled raw deflate
        if got is None:
            return data, False
        return got, True
    return data, False


def chunk_encode(entity: bytes, chunk_size: int = 1024) -> bytes:
    """Deterministic chunked framing (encoder twin, for fixtures and
    the oracle round-trip — same convention as kernels/jpeg.py's
    encoder)."""
    out = bytearray()
    for i in range(0, len(entity), chunk_size):
        part = entity[i : i + chunk_size]
        out += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def compress_one(entity: bytes, coding: str) -> bytes:
    """Deterministic single-coding encoder twin: fixed level 9, zlib's
    gzip wrapper (MTIME=0 — reproducible bytes)."""
    if coding in ("gzip", "x-gzip"):
        c = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    elif coding == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS)
    elif coding == "x-deflate":  # the mislabeling server: raw DEFLATE
        c = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    else:
        raise ValueError(f"unsupported coding for encode: {coding}")
    return c.compress(entity) + c.flush()


def build_response(
    entity: bytes,
    codings: list[str] | tuple[str, ...] = (),
    chunked: bool = False,
    status: int = 200,
    content_type: str = "text/html",
    chunk_size: int = 1024,
) -> bytes:
    """A full deterministic wire payload: codings applied left-to-right
    (so decode_body's right-to-left undo inverts them), chunked framing
    outermost, headers declaring exactly what was applied."""
    body = entity
    for coding in codings:
        body = compress_one(body, coding)
    headers = [f"HTTP/1.1 {status} OK", f"Content-Type: {content_type}"]
    if codings:
        labels = [c if c != "x-deflate" else "deflate" for c in codings]
        headers.append("Content-Encoding: " + ", ".join(labels))
    if chunked:
        body = chunk_encode(body, chunk_size)
        headers.append("Transfer-Encoding: chunked")
    else:
        headers.append(f"Content-Length: {len(body)}")
    return "\r\n".join(headers).encode("ascii") + _CRLFCRLF + body


def decode_body(payload: bytes) -> tuple[bytes, str, bool]:
    """Full wire decode of one response payload.

    Returns (entity_bytes, applied, ok): ``applied`` is the
    comma-joined layers actually undone in application order (e.g.
    ``"chunked,gzip"``), '' when the body was already an entity. On
    any failure the bytes stand as far as decoding got, ok=False.

    A payload that does not start with ``HTTP/`` is not a response
    record (WARC resource/conversion records carry bare entities) and
    passes through untouched — the same non-response tolerance as
    redirects.http_response_meta's NULL status.
    """
    if not payload.startswith(b"HTTP/"):
        return payload, "", True
    header, body = split_response(payload)
    chunked, codings = codings_of(header)
    applied: list[str] = []
    ok = True
    if chunked:
        body, step_ok = dechunk(body)
        if step_ok:
            applied.append("chunked")
        ok = ok and step_ok
    if len(codings) > MAX_CODING_LAYERS:
        return body, ",".join(applied), False
    if ok:
        for coding in reversed(codings):  # outermost (last listed) first
            body, step_ok = decompress_one(body, coding)
            if not step_ok:
                ok = False
                break
            applied.append(coding)
    return body, ",".join(applied), ok
