"""Charset sniffing + decoding for legacy (non-UTF-8) web pages.

``kernels/extract.decode_html`` is deliberately UTF-8-with-replacement
— it is the NORMATIVE kernel whose outputs are fixture-pinned
byte-identically, and the reference's extractor behaves the same way
(a page that is not UTF-8 extracts with replacement characters). But a
real web corpus is several percent legacy-encoded (cp1252, shift_jis,
gb2312, iso-8859-*), so the engine also ships this separate, OPT-IN
charset-aware decode front-end: sniff then decode, after which the
downstream pipeline (extraction, cleaning, dedup) sees correct text.

Sniffing follows the WHATWG encoding standard's precedence, stdlib
only (no chardet in the runtime — content-based guessing is also
nondeterministic across library versions, which would break
replayability):

1. BOM: UTF-8 / UTF-16LE / UTF-16BE (WHATWG: BOM beats everything);
2. the transport-layer ``charset=`` parameter (Content-Type header),
   when the caller has one;
3. ``<meta charset=...>`` or
   ``<meta http-equiv="Content-Type" content="...charset=...">``
   within the first ``SNIFF_WINDOW`` bytes (the standard prescans
   1024; we default wider because real pages violate the limit);
4. default: UTF-8 (not the standard's windows-1252 — a crawl corpus
   is majority UTF-8 and mislabeling UTF-8 as cp1252 creates exactly
   the mojibake functions/mojibake.py exists to undo).

Label normalization implements the WHATWG alias rules that matter in
practice: latin-1/iso-8859-1/ascii family -> windows-1252 (the
standard's single most important remapping), gb2312 -> gbk. Unknown or
undecodable labels fall back to UTF-8-with-replacement — the decode is
TOTAL over garbage.
"""

from __future__ import annotations

import codecs
import re

#: bytes of the head window the meta prescan looks at.
SNIFF_WINDOW = 4096

#: WHATWG label remappings (subset that changes behavior; everything
#: else resolves through the stdlib codec registry).
_ALIASES = {
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "gb2312": "gbk",
    "macintosh": "mac_roman",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._-]+)""", re.IGNORECASE
)
_HEADER_CHARSET_RE = re.compile(r"charset\s*=\s*\"?'?([a-zA-Z0-9._-]+)", re.IGNORECASE)


def normalize_label(label: str | None) -> str | None:
    """Resolve an encoding label to a python codec name, or None if the
    label names no known codec."""
    if not label:
        return None
    key = label.strip().strip("\"'").lower()
    key = _ALIASES.get(key, key)
    try:
        return codecs.lookup(key).name
    except LookupError:
        return None


def sniff_charset(
    html_bytes: bytes | None, content_type: str | None = None
) -> str:
    """WHATWG-precedence charset sniff: BOM > transport header > meta
    prescan > utf-8. Always returns a usable codec name."""
    if not html_bytes:
        return "utf-8"
    if html_bytes[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if html_bytes[:2] == b"\xff\xfe":
        return "utf-16-le"
    if html_bytes[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _HEADER_CHARSET_RE.search(content_type)
        if m:
            got = normalize_label(m.group(1))
            if got:
                return got
    m = _META_CHARSET_RE.search(html_bytes[:SNIFF_WINDOW])
    if m:
        got = normalize_label(m.group(1).decode("ascii", "replace"))
        if got:
            return got
    return "utf-8"


def decode_html_auto(
    html_bytes: bytes | None,
    content_type: str | None = None,
    fetch_cap: int | None = None,
) -> str:
    """Sniff + decode, total over garbage: any decode error falls back
    to utf-8-with-replacement (never raises). The BOM, when present, is
    consumed by its codec (utf-8-sig / utf-16)."""
    if html_bytes is None:
        return ""
    if fetch_cap is not None:
        html_bytes = html_bytes[:fetch_cap]
    enc = sniff_charset(html_bytes, content_type)
    # BOM-bearing inputs decode through the BOM-consuming codec variant
    if enc == "utf-8" and html_bytes[:3] == b"\xef\xbb\xbf":
        enc = "utf-8-sig"
    elif enc in ("utf-16-le", "utf-16-be") and html_bytes[:2] in (
        b"\xff\xfe",
        b"\xfe\xff",
    ):
        enc = "utf-16"
    try:
        return html_bytes.decode(enc, errors="replace")
    except Exception:
        return html_bytes.decode("utf-8", errors="replace")
