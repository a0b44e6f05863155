"""Normative pure-Python URL kernels.

These functions are the engine's *reference semantics* for URL
canonicalization, validation, filename/key derivation, and hashing.
They are used three ways, from identical code, so the per-row
invariant "byte-identical per url" reduces to Arrow round-trip
fidelity:

1. by ``pathik_spark.fixtures`` to generate golden expectation columns,
2. by the vectorized pandas UDFs in ``pathik_spark.functions.urls``,
3. by the sequential ordering oracle in ``pathik_spark.oracle``.

Reference parity (studied, not copied — behavior only):
- domain-name derivation: /root/reference/crawler/crawler.go:252-265 and
  /root/reference/storage/storage.go:189-202 (hostname ``.``->``_``, path
  trimmed of ``/`` then ``/``->``_``, joined by ``_``; parse failure ->
  ``"unknown"``).
- sanitize: /root/reference/storage/storage.go:79-119 (host+path, ~30
  unsafe chars -> ``_`` , then ``..`` -> ``_``, truncate to 200; note the
  Go version uses Host *including port*).
- filename assembly: /root/reference/storage/storage.go:218-227
  (``{domain}_{yyyy-MM-dd}.{html|md}``, unexpected type -> ``txt``).
- R2 key: /root/reference/storage/storage.go:129-131
  (``{uuid}+{sanitized}.{ext}``).
- URL validation: /root/reference/crawler/crawler.go:119-159 (scheme
  http/https, reject localhost + private IPv4 literals; the reference's
  DNS resolution step is environment-dependent and is replaced by the
  static checks only — documented divergence).

Canonicalization itself is **new-build** (BASELINE.json north_rule; the
reference never canonicalizes — SURVEY.md §2.9 B1). Spec:

- strip surrounding ASCII whitespace
- lowercase scheme and host; strip a single trailing dot from the host
- drop default ports (http:80, https:443)
- resolve dot-segments in the path (RFC 3986 §5.2.4); empty path -> "/"
- drop the fragment
- drop tracking params (``utm_*`` prefix and the exact set
  {fbclid, gclid, msclkid, yclid, mc_cid, mc_eid, ref_src}), sort the
  surviving ``k=v`` pairs lexicographically, re-join with ``&``
- percent-encoding is preserved as-is (no re-encoding)
- unparseable input -> None
"""

from __future__ import annotations

import ipaddress
from urllib.parse import urlsplit

TRACKING_EXACT = frozenset(
    {"fbclid", "gclid", "msclkid", "yclid", "mc_cid", "mc_eid", "ref_src"}
)
TRACKING_PREFIXES = ("utm_",)

# storage.go:105 — order matters only vs the later ".." pass
UNSAFE_CHARS = ':/\\?*"<>| \t\n\r&=+$,;^`{}[]()#%'
_SANITIZE_TABLE = str.maketrans({c: "_" for c in UNSAFE_CHARS})

DEFAULT_PORTS = {"http": "80", "https": "443"}


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    if path.startswith("/") and (not out or out[0] != ""):
        out.insert(0, "")
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize_url(url: str | None) -> str | None:
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if not scheme or not host:
        return None
    if not host.isascii():
        # IDNA/punycode (RFC 3490): 'münchen.example' and its
        # 'xn--mnchen-3ya.example' wire form are the SAME host — without
        # this they would hash to two url_hash identities and the seen
        # set would fetch international sites twice. Per-label encoding
        # AND per-label fallback (a label the codec rejects stays as-is
        # without aborting its valid siblings; empty labels kept so
        # 'a..b' round-trips) — total over garbage.
        def _idna(lab: str) -> str:
            if not lab or lab.isascii():
                return lab
            try:
                return lab.encode("idna").decode("ascii")
            except UnicodeError:
                return lab

        host = ".".join(_idna(lab) for lab in host.split("."))
    port = parts.port
    netloc = host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = remove_dot_segments(parts.path) or "/"
    query = ""
    if parts.query:
        kept = []
        for pair in parts.query.split("&"):
            if not pair:
                continue
            key = pair.split("=", 1)[0].lower()
            if key in TRACKING_EXACT or key.startswith(TRACKING_PREFIXES):
                continue
            kept.append(pair)
        kept.sort()
        query = "&".join(kept)
    canon = f"{scheme}://{netloc}{path}"
    if query:
        canon += f"?{query}"
    return canon


def url_host(url: str | None) -> str | None:
    """Lowercased hostname (no port), or None."""
    if url is None:
        return None
    try:
        host = urlsplit(url.strip()).hostname
    except ValueError:
        return None
    return host.lower().rstrip(".") if host else None


def validate_url(url: str | None) -> bool:
    """Static subset of crawler.go:119-159: scheme http/https, non-empty
    host, reject localhost/127.0.0.1 and private/loopback IPv4 literals.
    (The reference's live DNS check is non-deterministic and omitted.)"""
    if not url:
        return False
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return False
    if parts.scheme.lower() not in ("http", "https"):
        return False
    host = (parts.hostname or "").lower()
    if not host:
        return False
    if host in ("localhost", "127.0.0.1"):
        return False
    try:
        ip = ipaddress.ip_address(host)
    except ValueError:
        return True  # not an IP literal; DNS check intentionally skipped
    return not (ip.is_private or ip.is_loopback or ip.is_link_local)


def domain_name_for_file(url: str | None) -> str:
    """crawler.go:252-265 / storage.go:189-202 semantics."""
    if url is None:
        return "unknown"
    try:
        parts = urlsplit(url)
        host = parts.hostname or ""
    except ValueError:
        return "unknown"
    if not host:
        return "unknown"
    domain = host.replace(".", "_")
    path = parts.path.strip("/")
    if not path:
        return domain
    return f"{domain}_{path.replace('/', '_')}"


def sanitize_url(url: str | None) -> str:
    """storage.go:79-119 semantics (Host *with* port + path; unsafe chars
    -> '_'; '..' -> '_'; truncate to 200 chars)."""
    if url is None:
        return ""
    try:
        parts = urlsplit(url)
        parse_ok = bool(parts.netloc) or bool(parts.scheme)
    except ValueError:
        parse_ok = False
    if not parse_ok:
        result = url
        for ch in '/\\:*?"<>|':
            result = result.replace(ch, "_")
        return result
    result = parts.netloc
    if parts.path and parts.path != "/":
        result += "_" + parts.path.strip("/")
    result = result.translate(_SANITIZE_TABLE)
    result = result.replace("..", "_")
    return result[:200]


def filename_for(url: str | None, date_str: str, file_type: str) -> str:
    """storage.go:218-227: ``{domain}_{yyyy-MM-dd}.{html|md|txt}``.
    ``date_str`` comes from ``warc_ts`` (determinism), never wall clock."""
    safe = file_type if file_type in ("html", "md") else "txt"
    return f"{domain_name_for_file(url)}_{date_str}.{safe}"


def r2_key(uuid_str: str, url: str | None, file_type: str) -> str:
    """storage.go:129-131: ``{uuid}+{sanitizedURL}.{ext}``."""
    return f"{uuid_str}+{sanitize_url(url)}.{file_type}"
